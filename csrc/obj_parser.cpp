// Native OBJ geometry parser.
//
// C++ re-derivation of the reference's host-side two-pass OBJ scan
// (/root/reference/src/input/read_file_util.h:126-166 extract_num_elements,
// :536-655 extract_triangle_data): pass 1 counts v/vt/vn/usemtl and the
// fan-triangulated face total; pass 2 fills flat SoA buffers.  Semantics
// mirror gpu_pathtracer_tpu/utils/obj_io.py exactly (absent vt/vn indices
// are written as -1; the Python wrapper remaps them to trailing zero slots).
//
// Exposed as a C ABI for ctypes (no pybind11 in this image).

#include <cctype>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

struct Lines {
    std::string data;
    bool ok = false;
};

Lines read_file(const char* path) {
    Lines out;
    FILE* f = std::fopen(path, "rb");
    if (!f) return out;
    std::fseek(f, 0, SEEK_END);
    long n = std::ftell(f);
    std::fseek(f, 0, SEEK_SET);
    out.data.resize(static_cast<size_t>(n));
    size_t got = n ? std::fread(&out.data[0], 1, static_cast<size_t>(n), f) : 0;
    std::fclose(f);
    out.data.resize(got);
    out.ok = true;
    return out;
}

// Split a line into whitespace-separated tokens (collapse runs, like the
// Python " ".join(raw.split())).
inline void tokenize(const char* s, const char* end,
                     std::vector<std::pair<const char*, int>>& toks) {
    toks.clear();
    const char* p = s;
    while (p < end) {
        while (p < end && (*p == ' ' || *p == '\t' || *p == '\r')) ++p;
        const char* start = p;
        while (p < end && *p != ' ' && *p != '\t' && *p != '\r') ++p;
        if (p > start) toks.emplace_back(start, static_cast<int>(p - start));
    }
}

inline bool tok_is(const std::pair<const char*, int>& t, const char* kw) {
    int n = static_cast<int>(std::strlen(kw));
    return t.second == n && std::memcmp(t.first, kw, n) == 0;
}

inline double tok_f(const std::pair<const char*, int>& t) {
    char buf[64];
    int n = t.second < 63 ? t.second : 63;
    std::memcpy(buf, t.first, n);
    buf[n] = 0;
    return std::atof(buf);
}

// "v/t/n" face reference -> 0-based indices, -1 when absent.
inline void split_ref(const std::pair<const char*, int>& t, int* v, int* vt,
                      int* vn) {
    const char* p = t.first;
    const char* end = t.first + t.second;
    long vals[3] = {0, 0, 0};
    bool has[3] = {false, false, false};
    int field = 0;
    bool neg = false, any = false;
    long cur = 0;
    for (const char* q = p; q <= end; ++q) {
        if (q == end || *q == '/') {
            if (any && field < 3) {
                vals[field] = neg ? -cur : cur;
                has[field] = true;
            }
            ++field;
            neg = false;
            any = false;
            cur = 0;
        } else if (*q == '-') {
            neg = true;
        } else if (std::isdigit(static_cast<unsigned char>(*q))) {
            cur = cur * 10 + (*q - '0');
            any = true;
        }
    }
    *v = has[0] ? static_cast<int>(vals[0] - 1) : -1;
    *vt = has[1] ? static_cast<int>(vals[1] - 1) : -1;
    *vn = has[2] ? static_cast<int>(vals[2] - 1) : -1;
}

template <typename FN>
void for_each_line(const std::string& data, FN&& fn) {
    const char* p = data.data();
    const char* end = p + data.size();
    std::vector<std::pair<const char*, int>> toks;
    toks.reserve(16);
    while (p < end) {
        const char* nl = static_cast<const char*>(
            std::memchr(p, '\n', static_cast<size_t>(end - p)));
        const char* line_end = nl ? nl : end;
        tokenize(p, line_end, toks);
        if (!toks.empty()) fn(toks);
        p = nl ? nl + 1 : end;
    }
}

}  // namespace

extern "C" {

// Pass 1: counts.  out[0..4] = num_verts, num_uvs, num_norms, num_tris
// (after fan triangulation), num_usemtl_groups.  Returns 0 on success.
int gpt_obj_count(const char* path, long long* out) {
    Lines f = read_file(path);
    if (!f.ok) return 1;
    long long nv = 0, nt = 0, nn = 0, ntri = 0, nobj = 0;
    for_each_line(f.data, [&](std::vector<std::pair<const char*, int>>& toks) {
        auto& k = toks[0];
        if (tok_is(k, "v")) ++nv;
        else if (tok_is(k, "vt")) ++nt;
        else if (tok_is(k, "vn")) ++nn;
        else if (tok_is(k, "usemtl")) ++nobj;
        else if (tok_is(k, "f") && toks.size() >= 4)
            ntri += static_cast<long long>(toks.size()) - 3;
    });
    out[0] = nv; out[1] = nt; out[2] = nn; out[3] = ntri; out[4] = nobj;
    return 0;
}

// Pass 2: fill caller-allocated buffers sized from gpt_obj_count.
// mat_names: '\n'-joined material names (index order).  Absent vt/vn
// indices are stored as -1.  Returns 0 on success.
int gpt_obj_parse(const char* path, const char* mat_names, int num_mats,
                  int32_t* tri_vidx, int32_t* tri_tidx, int32_t* tri_nidx,
                  int32_t* mat_idx, int32_t* object_idx, float* verts,
                  float* uvs, float* norms) {
    Lines f = read_file(path);
    if (!f.ok) return 1;

    std::unordered_map<std::string, int> name_to_idx;
    {
        const char* p = mat_names;
        int idx = 0;
        while (p && *p) {
            const char* nl = std::strchr(p, '\n');
            size_t n = nl ? static_cast<size_t>(nl - p) : std::strlen(p);
            name_to_idx.emplace(std::string(p, n), idx++);
            p = nl ? nl + 1 : nullptr;
        }
    }

    long long iv = 0, it = 0, in = 0, itri = 0;
    int current_mat = 0;
    int cur_object = -1;
    std::vector<int> refs_v, refs_t, refs_n;
    refs_v.reserve(8); refs_t.reserve(8); refs_n.reserve(8);

    for_each_line(f.data, [&](std::vector<std::pair<const char*, int>>& toks) {
        auto& k = toks[0];
        if (tok_is(k, "usemtl")) {
            if (num_mats > 1 && toks.size() > 1) {
                auto it_m = name_to_idx.find(
                    std::string(toks[1].first, toks[1].second));
                current_mat = it_m == name_to_idx.end() ? 0 : it_m->second;
            } else {
                current_mat = 0;
            }
            ++cur_object;
        } else if (tok_is(k, "v") && toks.size() >= 4) {
            verts[iv * 3 + 0] = static_cast<float>(tok_f(toks[1]));
            verts[iv * 3 + 1] = static_cast<float>(tok_f(toks[2]));
            verts[iv * 3 + 2] = static_cast<float>(tok_f(toks[3]));
            ++iv;
        } else if (tok_is(k, "vt") && toks.size() >= 3) {
            uvs[it * 2 + 0] = static_cast<float>(tok_f(toks[1]));
            uvs[it * 2 + 1] = static_cast<float>(tok_f(toks[2]));
            ++it;
        } else if (tok_is(k, "vn") && toks.size() >= 4) {
            norms[in * 3 + 0] = static_cast<float>(tok_f(toks[1]));
            norms[in * 3 + 1] = static_cast<float>(tok_f(toks[2]));
            norms[in * 3 + 2] = static_cast<float>(tok_f(toks[3]));
            ++in;
        } else if (tok_is(k, "f") && toks.size() >= 4) {
            refs_v.clear(); refs_t.clear(); refs_n.clear();
            for (size_t i = 1; i < toks.size(); ++i) {
                int v, vt, vn;
                split_ref(toks[i], &v, &vt, &vn);
                refs_v.push_back(v); refs_t.push_back(vt); refs_n.push_back(vn);
            }
            int nref = static_cast<int>(refs_v.size());
            for (int i = 0; i + 2 < nref; ++i) {
                int a = 0, b = 1 + i, c = 2 + i;
                tri_vidx[itri * 3 + 0] = refs_v[a];
                tri_vidx[itri * 3 + 1] = refs_v[b];
                tri_vidx[itri * 3 + 2] = refs_v[c];
                tri_tidx[itri * 3 + 0] = refs_t[a];
                tri_tidx[itri * 3 + 1] = refs_t[b];
                tri_tidx[itri * 3 + 2] = refs_t[c];
                tri_nidx[itri * 3 + 0] = refs_n[a];
                tri_nidx[itri * 3 + 1] = refs_n[b];
                tri_nidx[itri * 3 + 2] = refs_n[c];
                mat_idx[itri] = current_mat;
                object_idx[itri] = cur_object < 0 ? 0 : cur_object;
                ++itri;
            }
        }
    });
    return 0;
}

}  // extern "C"

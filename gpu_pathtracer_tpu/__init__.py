"""gpu_pathtracer_tpu — a TPU-native differentiable path tracer.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the reference
CUDA renderer `aloysius-aryaputera/gpu_pathtracer`:

* unidirectional path tracing with light-tree next-event importance sampling,
* stochastic progressive photon mapping (SPPM) with surface + volumetric maps,
* LBVH (Karras 2012) acceleration with watertight Woop triangle intersection,
* modified-Phong BSDF, nested dielectrics with priority lists,
* texture / normal(bump) mapping, depth of field, sub-surface scattering,
* participating media (Henyey-Greenstein), equirectangular sky env map.

The design is TPU-first: structure-of-arrays scene data, wavefront (masked
lax.scan) integrators instead of divergent megakernels, a stackless threaded
LBVH traversal, counter-based RNG, and `shard_map` data parallelism over rays
with replicated scene state.
"""

__version__ = "0.1.0"

from gpu_pathtracer_tpu import constants  # noqa: F401

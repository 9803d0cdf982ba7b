"""bundler_sfm_tpu — TPU-native incremental Structure-from-Motion.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
snavely/bundler_sfm (Photo Tourism): SIFT-key matching, pairwise geometric
verification, track building, incremental camera registration, Schur-complement
bundle adjustment, and the surrounding exporters/tools — built MXU-first.

Double precision is enabled globally: the reference pipeline is all C doubles
(`lib/sfm-driver/sfm.c`, `lib/sba-1.5`), and bundle-adjustment parity needs it.
Matching and RANSAC hot paths explicitly downcast to f32 where that is exact
or sufficient (see DESIGN.md "Precision policy").
"""

import os as _os

from jax import config as _jax_config

_jax_config.update("jax_enable_x64", True)

# Honor JAX_COMPILATION_CACHE_DIR by force: on the remote-TPU (axon tunnel)
# backend the env var alone is silently ignored, and every process pays the
# full ~100 s/program remote compile.  jax.config.update works everywhere.
if _os.environ.get("JAX_COMPILATION_CACHE_DIR"):
    _jax_config.update("jax_compilation_cache_dir",
                       _os.environ["JAX_COMPILATION_CACHE_DIR"])
    _jax_config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

__version__ = "0.1.0"

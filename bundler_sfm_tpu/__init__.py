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

from jax import config as _jax_config

_jax_config.update("jax_enable_x64", True)

__version__ = "0.1.0"

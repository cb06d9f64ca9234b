"""nvse_tpu — TPU-native neural-vocoders-as-speech-enhancers framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
`Andong-Li-speech/Neural-Vocoders-as-Speech-Enhancers` (ICASSP 2025):
ten GAN vocoder/enhancer generators (HiFiGAN, iSTFTNet, APNet, APNet2,
FreeV, BSRNN, BSRNN_24k, GCRN, ConvTasNet, HDDemucs), shared
discriminators (MPD/MSD/MRD/CQT), spectral + GAN losses, unified
trainers (T-F / time / joint denoise+vocoder), inference CLIs and an
offline metrics suite — all built TPU-first:

* static-shape, jit-compiled compute; features (mel / STFT) computed
  on-device inside the train step instead of in host dataloader workers;
* SPMD data parallelism over a `jax.sharding.Mesh` (ICI all-reduce
  inserted by XLA) instead of the reference's single hard-coded GPU;
* batched-matmul formulations for band-split encoders/decoders and
  DFT-as-matmul STFT paths that map onto the MXU.

Package layout:
  ops/       pure-JAX DSP (stft/istft/mel/inverse-mel/resample/griffin-lim)
  models/    Flax generators + discriminators, name registry
  losses/    GAN + spectral losses
  data/      host-side audio pipeline (wav IO, segments, noise mixing)
  train/     unified GAN trainer, checkpointing, schedules
  infer/     batch inference / RTF harness
  metrics/   offline metric CLIs (LSD, SNR, STOI, MCD, F0, ...)
  parallel/  mesh construction + sharding helpers
  utils/     config (AttrDict-compatible), logging
"""

__version__ = "0.1.0"

import os as _os

# NVSE_PLATFORM=cpu forces the CPU backend for any CLI. The axon TPU
# tunnel's sitecustomize overrides the JAX_PLATFORMS env var, so the
# only reliable switch is jax.config before first backend use — which
# importing this package guarantees for every entry point.
_platform = _os.environ.get("NVSE_PLATFORM")
if _platform:
    try:
        import jax as _jax

        _jax.config.update("jax_platforms", _platform)
    except Exception:
        pass

# Persistent XLA compilation cache: first TPU compiles through the
# remote tunnel take minutes; cached reruns are instant. Opt out with
# NVSE_NO_COMPILE_CACHE=1.

if (not _os.environ.get("NVSE_NO_COMPILE_CACHE")
        and "cpu" not in _os.environ.get("JAX_PLATFORMS", "")
        and _platform != "cpu"):
    # TPU-only: cached CPU AOT artifacts are machine-feature-specific
    # (XLA warns they can SIGILL across hosts); CPU compiles are cheap
    # anyway, so the cache is enabled only for accelerator platforms
    try:
        import jax as _jax

        # also honor a CPU platform forced via jax.config (conftest,
        # ad-hoc scripts) — CPU AOT cache artifacts are machine-specific
        if "cpu" in (_jax.config.jax_platforms or ""):
            raise RuntimeError("cpu platform — skip compile cache")
        _cache = _os.environ.get(
            "NVSE_COMPILE_CACHE",
            _os.path.join(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))),
                          ".jax_cache"),
        )
        _jax.config.update("jax_compilation_cache_dir", _cache)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # jax missing/unconfigurable: fine, cache is an optimisation
        pass

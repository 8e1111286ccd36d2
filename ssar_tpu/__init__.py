"""ssar_tpu — TPU-native self-supervised audio-reactive video synthesis framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
JCBrouwer/self-supervised-audio-reactive (reference mounted at /root/reference):

- ``ssar_tpu.audio``    — differentiable librosa-equivalent DSP stack (reference:
  ssar/features/rosa/*, ssar/features/audio.py) as pure-jnp static-shape programs.
- ``ssar_tpu.ops``      — hot kernels (Pallas + XLA): absdiff, exact quantiles,
  associative-scan IIR biquads, kaiser-sinc resampling, upfirdn2d, fused
  modulated conv (reference: CUDA/Triton/C++ kernels in ssar/analysis/
  efficient_quantile, ssar/models/sashimi/cauchy, ssar/metrics/absdiff.py,
  maua's upfirdn2d/fused_bias_act).
- ``ssar_tpu.gan``      — StyleGAN2 mapper/synthesizer (reference:
  ssar/models/stylegan2.py + maua wrapper API) in NHWC bf16 with a
  modulate-input/demodulate-output formulation that keeps convs on the MXU.
- ``ssar_tpu.models``   — audio->latent sequence models (GRU/LSTM/conv/MLP/
  transformer/S4 backbones, latent+noise decoders, HiPPO timeseries).
- ``ssar_tpu.metrics``  — correlation zoo + reactivity metrics (losses & eval).
- ``ssar_tpu.generate`` — random-patch system, MIR pipeline, test-time
  optimization, audio2video inference.
- ``ssar_tpu.train``    — supervised / self-supervised training under pjit.
- ``ssar_tpu.parallel`` — device mesh + sharding helpers (DP over batch/frames,
  optional TP over synthesis channels, SP over time).

Global conventions follow the reference (SURVEY.md §0): audio is resampled to
``sr = 1024 * fps`` so one STFT hop (1024 samples) equals one video frame;
the canonical audio feature vector has 59 dims; latents are W+ sequences
``(T, n_ws, 512)`` plus noise pyramids.
"""

__version__ = "0.1.0"

import os as _os

# Persistent compilation cache: the axon remote-compile path costs minutes
# per program signature; caching compiled executables across processes makes
# every CLI / bench invocation after the first fast.  Opt out with
# SSAR_TPU_NO_COMPILE_CACHE=1.
if not _os.environ.get("SSAR_TPU_NO_COMPILE_CACHE"):
    try:
        import hashlib as _hashlib

        import jax as _jax

        # Key the cache by host CPU features: XLA:CPU AOT executables are
        # feature-specific, and loading one compiled on a different host
        # can execute incorrectly (observed as NaNs) rather than fail.
        try:
            with open("/proc/cpuinfo") as _f:
                _lines = _f.readlines()
            # flags alone are not discriminating enough: two hosts with
            # identical flag sets can get different XLA target tunings
            # (+prefer-no-scatter/-gather), and loading the other host's AOT
            # executable is undefined behavior. Include the model name.
            _fp = next(l for l in _lines if l.startswith("flags"))
            _fp += next((l for l in _lines if l.startswith("model name")), "")
        except Exception:
            import platform as _platform

            _fp = _platform.processor() or "unknown"
        _tag = _hashlib.md5(_fp.encode()).hexdigest()[:10]
        _cache_dir = _os.environ.get(
            "JAX_COMPILATION_CACHE_DIR",
            _os.path.expanduser(f"~/.cache/ssar_tpu_jax/{_tag}"))
        _os.makedirs(_cache_dir, exist_ok=True)
        _jax.config.update("jax_compilation_cache_dir", _cache_dir)
        # On the tunneled remote-compile runtime even sub-second programs
        # cost a full round trip to rebuild; persist everything.
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
    except Exception:
        pass

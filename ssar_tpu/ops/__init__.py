"""Hot kernels: Pallas + XLA implementations with jnp references.

Each op here replaces a native kernel or hot torch op in the reference
(SURVEY.md §2.6): efficient_quantile (C++) -> quantile.py; absdiff (Triton)
-> absdiff.py; torchaudio biquads -> iir.py (associative scan); torchaudio
kaiser resample -> resample.py (polyphase conv); FFT-DCT -> dct.py;
gaussian/median filters -> gaussian.py / median.py; StyleGAN2 CUDA ops
(upfirdn2d / fused_bias_act) -> upfirdn.py / fused_act.py.
"""
from .absdiff import absdiff, absdiff_pallas, absdiff_ref, video_absdiff
from .dct import dct
from .gaussian import gaussian_filter
from .iir import high_pass, highpass_biquad, low_pass, lowpass_biquad, mid_pass
from .median import median_filter
from .quantile import (
    clamp_lower_percentile,
    clamp_peaks_percentile,
    clamp_upper_percentile,
    masked_quantile,
    quantile,
)
from .median_pallas import sliding_median_lastaxis
from .resample import resample
from .vandermonde import s4d_kernel_fused, s4d_vandermonde_pallas, s4d_vandermonde_ref

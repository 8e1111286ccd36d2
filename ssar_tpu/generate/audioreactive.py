"""Audioreactive patch-authoring API + randomized patch pipeline.

Equivalent of the reference's ``ssar/patches/`` subsystem (SURVEY.md §2:
``random_patches.py`` 573 LoC + ``drum_patches.py`` + the hand-written
example patches under ``patches/examples/``, which build on maua's
``audioreactive`` helper library):

- signal shaping: ``compress`` / ``expand`` dynamic-range ops,
  ``percentile_clip``, causal ``gaussian_filter`` (re-exported),
- frame-rate feature envelopes with authoring knobs:
  ``onsets(audio, sr, n_frames, fmin, clip, smooth, power)``, ``volume``,
  ``chroma``, ``tonnetz``, ``pitch_track``, ``tempo``,
- latent loop generators: ``slerp_loops`` / ``spline_loops`` /
  ``gaussian_loops`` / ``constant_loops`` (tempo-synced via ``n_bars``),
- reactive primitives (maua.audiovisual.patches.primitives):
  ``ModulatedLatents``, ``ModulatedNoise``, ``PitchTrackLatents``,
  ``TempoLoopLatents``, ``TempoLoopNoise``, ``TonalLatents``, ``TonalNoise``,
- ``RandomPatch``: the compositional sampler over
  (audio source -> band filter -> feature -> postprocess -> target)
  (ssar/patches/random_patches.py:310-440),
- the patch-file contract: a module defining ``initialize(args)`` /
  ``get_latents(selection, args)`` / ``get_noise(height, width, scale,
  num_scales, args)`` is rendered by ``render_patch``
  (the interface of ssar/patches/examples/*).

TPU notes: envelopes and latent mixes are tiny (T x 512-ish) — the value of
jit here is avoiding eager complex ops (STFT paths) and fusing the
elementwise chains; the heavy lifting stays in the synthesizer.
"""
from __future__ import annotations

import types
from functools import partial
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from ..audio import features as AF
from ..audio.beat import onset_strength
from ..audio.beat_host import estimate_tempo
from ..audio.processing import normalize
from ..metrics.rhythmic import percentile_clip
from ..ops.gaussian import gaussian_filter
from ..ops.iir import high_pass, low_pass, mid_pass
from .latent import spline_loop_latents

__all__ = [
    "compress", "expand", "normalize", "percentile_clip", "gaussian_filter",
    "onsets", "volume", "rms", "chroma", "tonnetz", "pitch_track", "tempo",
    "laplacian_segmentation",
    "load_audio", "load_latents", "generate_latents", "wrapping_slice",
    "perlin_noise", "circular_mask", "plot_signals", "plot_spectra",
    "slerp_loops", "spline_loops", "gaussian_loops", "constant_loops",
    "ModulatedLatents", "ModulatedNoise", "PitchTrackLatents",
    "TempoLoopLatents", "TempoLoopNoise", "TonalLatents", "TonalNoise",
    "chroma_weight_latents",
    "RandomPatch", "render_patch", "load_patch_module",
    "AddNoise", "replication_pad", "sequential",
]


# ---------------------------------------------------------------- loading --
def load_audio(audio_file: str, offset: float = 0.0, duration: float | None = None):
    """Mono waveform slice -> (audio, sr, duration_seconds).

    The three-tuple matches the reference patches' idiom
    ``audio, sr, dur = ar.load_audio(path, offset, duration)``
    (ssar/patches/examples/01_intro.py:8-16) so stem files
    (``drums.wav`` / ``bass.wav`` / ``other.wav``) drop straight in."""
    from ..train.data import load_audio as _load

    audio, sr = _load(audio_file)
    audio = audio[int(offset * sr):]
    if duration is not None:
        audio = audio[: int(duration * sr)]
    return jnp.asarray(audio, jnp.float32), int(sr), audio.shape[-1] / sr


def load_latents(path: str) -> jax.Array:
    """(K, n_ws, 512) W+ keyframe selection from a .npy/.npz file
    (ar.load_latents; the reference patches' saved palette workflow)."""
    arr = np.load(path, allow_pickle=False)
    if hasattr(arr, "files"):  # npz: first array wins
        arr = arr[arr.files[0]]
    return jnp.asarray(arr, jnp.float32)


def generate_latents(n_latents: int, model_file: str | None = None, seed: int = 0,
                     gan_config=None) -> jax.Array:
    """Sample n fresh W+ keyframes through the mapper (ar.generate_latents)."""
    from ..gan.wrapper import StyleGAN2Mapper

    mapper = StyleGAN2Mapper(model_file=model_file, config=gan_config)
    return mapper(jax.random.normal(jax.random.PRNGKey(seed), (n_latents, 512)))


def wrapping_slice(tensor, start: int, length: int, dim: int = 0):
    """Length-``length`` slice starting at ``start`` that wraps around the
    end of ``tensor`` along ``dim`` (ar.wrapping_slice)."""
    tensor = jnp.asarray(tensor)
    idx = jnp.mod(jnp.arange(start, start + length), tensor.shape[dim])
    return jnp.take(tensor, idx, axis=dim)


# ------------------------------------------------------------ signal ops --
def compress(x: jax.Array, threshold: float = 0.5, ratio: float = 0.5) -> jax.Array:
    """Soft-knee downward compression of a [0, 1] envelope above
    ``threshold`` (maua audioreactive.signal.compress semantics)."""
    x = normalize(x)
    over = jnp.maximum(x - threshold, 0.0)
    return normalize(jnp.where(x > threshold, threshold + over * ratio, x))


def expand(x: jax.Array, threshold: float = 0.5, ratio: float = 2.0) -> jax.Array:
    """Upward expansion of a [0, 1] envelope above ``threshold``."""
    x = normalize(x)
    over = jnp.maximum(x - threshold, 0.0)
    return normalize(jnp.where(x > threshold, threshold + over * ratio, x))


def _to_frames(env: jax.Array, n_frames: int) -> jax.Array:
    """Resample a (T, ...) envelope to n_frames on the time axis."""
    env = jnp.asarray(env, jnp.float32)
    if env.shape[0] == n_frames:
        return env
    return jax.image.resize(env, (n_frames,) + env.shape[1:], method="linear")


# --------------------------------------------------- feature envelopes --
def onsets(audio: jax.Array, sr: int, n_frames: int, fmin: float | None = None,
           fmax: float | None = None, clip: float | None = None, smooth: float = 1.0,
           power: float = 1.0) -> jax.Array:
    """Onset-strength envelope with the authoring knobs of ar.onsets:
    optional band selection (high-pass at ``fmin`` / low-pass at ``fmax``),
    percentile clip, gaussian smooth, exponent.  (n_frames,) in [0, 1]."""
    audio = jnp.asarray(audio, jnp.float32)
    if fmin is not None:
        audio = high_pass(audio, sr, fmin=fmin)
    if fmax is not None:
        audio = low_pass(audio, sr, fmax=fmax)
    env = AF.onsets(audio, int(sr))[:, 0]
    env = _to_frames(env, n_frames)
    if clip is not None:
        env = percentile_clip(env, clip)
    if smooth:
        env = gaussian_filter(env, smooth, causal=0.0)
    return normalize(env) ** power


def volume(audio: jax.Array, sr: int, n_frames: int, smooth: float = 1.0) -> jax.Array:
    env = AF.rms(jnp.asarray(audio, jnp.float32), int(sr))[:, 0]
    env = _to_frames(env, n_frames)
    if smooth:
        env = gaussian_filter(env, smooth)
    return normalize(env)


def rms(audio: jax.Array, sr: int, n_frames: int, fmin: float | None = None,
        fmax: float | None = None, smooth: float = 1.0, clip: float | None = None,
        power: float = 1.0) -> jax.Array:
    """Normalised RMS loudness envelope with the authoring knobs of ar.rms
    (optional band-pass, gaussian smooth, percentile clip, exponent);
    (n_frames,) in [0, 1].  ``ar.rms(audio, sr, n, smooth=100) ** 2`` is the
    reference's drop-weight idiom (patches/examples/01_intro.py:22)."""
    audio = jnp.asarray(audio, jnp.float32)
    if fmin is not None and fmax is not None:
        audio = mid_pass(audio, sr, fmin=fmin, fmax=fmax)
    elif fmin is not None:
        audio = high_pass(audio, sr, fmin=fmin)
    elif fmax is not None:
        audio = low_pass(audio, sr, fmax=fmax)
    env = AF.rms(audio, int(sr))[:, 0]
    env = _to_frames(env, n_frames)
    if clip is not None:
        env = percentile_clip(env, clip)
    if smooth:
        env = gaussian_filter(env, smooth)
    return normalize(env) ** power


def laplacian_segmentation(audio: jax.Array, sr: int, n_frames: int,
                           ks=(2, 4, 6, 8, 16)) -> jax.Array:
    """(n_frames, len(ks)) integer section labels per k — the patch-author
    flavour of segmentation (ar.laplacian_segmentation), backed by the CQT
    recurrence pipeline (audio/segment.py)."""
    from ..audio.segment import laplacian_segmentation_rosa

    labels = laplacian_segmentation_rosa(np.asarray(audio, np.float32), sr, n_frames, ks=ks)
    return jnp.asarray(labels)


def chroma(audio: jax.Array, sr: int, n_frames: int, type: str = "cens",
           nearest_neighbor: bool = False) -> jax.Array:
    """(n_frames, 12) chromagram; ``nearest_neighbor`` hard-assigns each
    frame to its argmax class (ar.chroma semantics)."""
    del type  # cens is the only on-device flavour; stft/cqt map to it
    ch = AF.chromagram(jnp.asarray(audio, jnp.float32), int(sr))
    ch = _to_frames(ch, n_frames)
    if nearest_neighbor:
        ch = jax.nn.one_hot(jnp.argmax(ch, axis=1), ch.shape[1])
    return ch


def tonnetz(audio: jax.Array, sr: int, n_frames: int, **kw) -> jax.Array:
    t = AF.tonnetz(jnp.asarray(audio, jnp.float32), int(sr))
    return _to_frames(t, n_frames)


def pitch_track(audio: jax.Array, sr: int, n_frames: int, smooth: float = 4.0) -> jax.Array:
    """(n_frames,) predominant pitch class in [0, 12) via piptrack."""
    from ..audio.pitch import piptrack

    @partial(jax.jit, static_argnames=("sr",))
    def _track(a, sr):
        pitches, mags, pmask = piptrack(a, sr)
        w = jnp.where(pmask, mags, 0.0)
        idx = jnp.argmax(w, axis=0)
        hz = jnp.take_along_axis(pitches, idx[None], axis=0)[0]
        hz = jnp.maximum(hz, 1e-3)
        return jnp.mod(12.0 * jnp.log2(hz / 440.0) + 69.0, 12.0)

    pc = _track(jnp.asarray(audio, jnp.float32), int(sr))
    pc = _to_frames(pc, n_frames)
    if smooth:
        pc = gaussian_filter(pc, smooth)
    return pc


def tempo(audio: jax.Array, sr: int, prior: str = "lognormal") -> float:
    """Global tempo estimate in BPM (host, one number per track).

    ``prior="uniform"`` flattens the log-normal BPM prior (the reference's
    two prior flavours, patches/random_patches.py:190-193)."""
    env = np.asarray(onset_strength(jnp.asarray(audio, jnp.float32), int(sr)))
    prior_s = 1.0 if prior == "lognormal" else 1e6
    return float(estimate_tempo(env, sr=sr, hop_length=1024, prior_s=prior_s))


# ----------------------------------------------------------- latent loops --
def _slerp(a: jax.Array, b: jax.Array, t: jax.Array) -> jax.Array:
    """Spherical interpolation along the leading broadcast of t."""
    an = a / (jnp.linalg.norm(a) + 1e-12)
    bn = b / (jnp.linalg.norm(b) + 1e-12)
    omega = jnp.arccos(jnp.clip(jnp.sum(an * bn), -1 + 1e-7, 1 - 1e-7))
    so = jnp.sin(omega)
    return (jnp.sin((1 - t)[..., None, None] * omega) * a + jnp.sin(t[..., None, None] * omega) * b) / so


def slerp_loops(latent_selection, n_frames: int, n_loops: float = 1.0,
                smoothing: float = 1.0, loop: bool = True) -> jax.Array:
    """Spherically-interpolated loop through W+ keyframes (ar.slerp_loops).
    latent_selection (K, n_ws, 512) -> (n_frames, n_ws, 512)."""
    sel = jnp.asarray(latent_selection, jnp.float32)
    if loop:
        sel = jnp.concatenate([sel, sel[:1]], axis=0)
    K = sel.shape[0]
    pos = jnp.mod(jnp.linspace(0, (K - 1) * n_loops, n_frames), K - 1 + 1e-6)
    i0 = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, K - 2)
    frac = pos - i0
    out = jax.vmap(lambda i, t: _slerp(sel[i], sel[i + 1], t))(i0, frac)
    if smoothing:
        out = gaussian_filter(out, smoothing)
    return out


def spline_loops(latent_selection, n_frames: int, n_loops: float = 1.0,
                 smoothing: float = 0.0) -> jax.Array:
    out = spline_loop_latents(jnp.asarray(latent_selection, jnp.float32), n_frames, n_loops)
    if smoothing:
        out = gaussian_filter(out, smoothing)
    return out


def gaussian_loops(latent_selection, n_frames: int, n_loops: float = 1.0,
                   smoothing: float = 8.0) -> jax.Array:
    """Gaussian-smoothed nearest-keyframe loop."""
    sel = jnp.asarray(latent_selection, jnp.float32)
    K = sel.shape[0]
    idx = jnp.mod(jnp.floor(jnp.linspace(0, K * n_loops, n_frames)), K).astype(jnp.int32)
    return gaussian_filter(sel[idx], smoothing, mode="circular")


def constant_loops(latent_selection, n_frames: int, n_loops: float = 1.0,
                   smoothing: float = 0.0) -> jax.Array:
    sel = jnp.asarray(latent_selection, jnp.float32)
    return jnp.broadcast_to(sel[0], (n_frames,) + sel.shape[1:])


LOOP_TYPES = {"slerp": slerp_loops, "spline": spline_loops,
              "gaussian": gaussian_loops, "constant": constant_loops}


# ------------------------------------------------------------- primitives --
def ModulatedLatents(envelope: jax.Array, base: jax.Array, modulation) -> jax.Array:
    """latents = (1 - env) * base + env * modulation (maua primitive).
    envelope (T,), base (T, n_ws, 512), modulation (n_ws, 512) or (T, ...)."""
    env = envelope[:, None, None]
    modulation = jnp.asarray(modulation, jnp.float32)
    if modulation.ndim == 2:
        modulation = modulation[None]
    return (1 - env) * base + env * modulation


def ModulatedNoise(envelope: jax.Array, base: jax.Array, modulation: jax.Array) -> jax.Array:
    """noise = (1 - env) * base + env * modulation, (T, H, W)."""
    env = envelope[:, None, None]
    return (1 - env) * base + env * modulation


def PitchTrackLatents(pitch_classes: jax.Array, palette: jax.Array,
                      smoothing: float = 4.0) -> jax.Array:
    """Frame pitch class selects (interpolates) palette latents."""
    K = palette.shape[0]
    pos = pitch_classes / 12.0 * K
    i0 = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, K - 1)
    i1 = jnp.mod(i0 + 1, K)
    frac = (pos - i0)[:, None, None]
    out = palette[i0] * (1 - frac) + palette[i1] * frac
    return gaussian_filter(out, smoothing) if smoothing else out


def TempoLoopLatents(bpm: float, palette: jax.Array, n_frames: int, fps: float = 24,
                     n_bars: int = 4, type: str = "spline", smooth: float = 4.0) -> jax.Array:
    """Loop through the palette once every ``n_bars`` bars of 4/4 at ``bpm``."""
    frames_per_loop = n_bars * 4 * 60.0 / bpm * fps
    n_loops = max(n_frames / max(frames_per_loop, 1e-6), 1e-3)
    return LOOP_TYPES[type](palette, n_frames, n_loops, smooth)


def TempoLoopNoise(key, bpm: float, size: tuple[int, int], n_frames: int, fps: float = 24,
                   n_bars: int = 4, smooth: float = 4.0) -> jax.Array:
    """Noise loop synced to the tempo: spline loop through K noise keyframes."""
    frames_per_loop = n_bars * 4 * 60.0 / bpm * fps
    n_loops = max(n_frames / max(frames_per_loop, 1e-6), 1e-3)
    keyframes = jax.random.normal(key, (4,) + tuple(size))
    out = spline_loop_latents(keyframes.reshape(4, -1), n_frames, n_loops).reshape((n_frames,) + tuple(size))
    return gaussian_filter(out, smooth) if smooth else out


def TonalLatents(chromagram: jax.Array, palette: jax.Array) -> jax.Array:
    """Chroma-weighted palette mix: einsum("TC,CNL->TNL") — the
    high-chroma-correlation recipe (ssar/metrics/generate.py:80-89)."""
    ch = chromagram / (jnp.sum(chromagram, axis=1, keepdims=True) + 1e-8)
    C = ch.shape[1]
    return jnp.einsum("TC,CNL->TNL", ch, palette[:C])


def chroma_weight_latents(chroma: jax.Array, latents: jax.Array) -> jax.Array:
    """Chroma-weighted average of 12 latent keyframes -> (T, n_ws, 512)
    (ar.chroma_weight_latents; argument order matches the reference)."""
    return TonalLatents(jnp.asarray(chroma, jnp.float32), jnp.asarray(latents, jnp.float32))


def perlin_noise(key, shape: tuple[int, int, int], res: tuple[int, int, int],
                 octaves: int = 1, persistence: float = 0.5) -> jax.Array:
    """Smooth fractal (T, H, W) perlin noise for noise-pyramid bases
    (ar.perlin_noise).  ``res`` is the lattice resolution per axis; higher
    octaves add halved-amplitude detail."""
    key = jax.random.PRNGKey(key) if isinstance(key, int) else key
    out = jnp.zeros(shape, jnp.float32)
    amp, total = 1.0, 0.0
    for o in range(octaves):
        key, sub = jax.random.split(key)
        lattice = jax.random.normal(
            sub, (min(res[0] * 2**o + 1, shape[0]),
                  min(res[1] * 2**o + 1, shape[1]),
                  min(res[2] * 2**o + 1, shape[2])))
        out = out + amp * jax.image.resize(lattice, shape, method="cubic")
        total += amp
        amp *= persistence
    out = out / total
    return out / (jnp.std(out) + 1e-8)


def circular_mask(h: int, w: int, center: tuple[int, int] | None = None,
                  radius: float | None = None, soft: float = 0.0) -> jax.Array:
    """(h, w) soft disc mask in [0, 1] for spatial noise control (the
    reference temper.py idiom, ssar/patches/examples/temper.py:40-54).
    ``soft`` > 0 gaussian-blurs the hard edge."""
    if center is None:
        center = (w / 2, h / 2)
    if radius is None:
        radius = min(center[0], center[1], w - center[0], h - center[1])
    Y, X = jnp.mgrid[:h, :w]
    mask = (jnp.sqrt((X - center[0]) ** 2 + (Y - center[1]) ** 2) <= radius).astype(jnp.float32)
    if soft > 0:
        # separable blur along both spatial axes via the shared 1-d kernel
        mask = gaussian_filter(mask, soft, mode="replicate")
        mask = gaussian_filter(mask.T, soft, mode="replicate").T
    return mask


def TonalNoise(key, chromagram: jax.Array, size: tuple[int, int]) -> jax.Array:
    """Chroma-weighted mix of C noise keyframes, (T, H, W)."""
    C = chromagram.shape[1]
    ch = chromagram / (jnp.sum(chromagram, axis=1, keepdims=True) + 1e-8)
    bank = jax.random.normal(key, (C,) + tuple(size))
    return jnp.einsum("TC,Chw->Thw", ch, bank)


# ----------------------------------------------------------- RandomPatch --
_SOURCES = {"full": lambda a, sr: a,
            "harmonic": lambda a, sr: AF.harmonic(a),
            "percussive": lambda a, sr: AF.percussive(a)}
_FILTERS = {"none": lambda a, sr: a,
            "low": lambda a, sr: low_pass(a, sr, fmax=100),
            "low-mid": lambda a, sr: mid_pass(a, sr, fmin=100, fmax=400),
            "mid": lambda a, sr: mid_pass(a, sr, fmin=400, fmax=2000),
            "high-mid": lambda a, sr: mid_pass(a, sr, fmin=2000, fmax=5000),
            "high": lambda a, sr: high_pass(a, sr, fmin=5000)}
_POSTPROCESS = {"none": lambda e, kg: e,
                "smooth": lambda e, kg: gaussian_filter(e, kg.choice([1, 3, 5, 7, 15]),
                                                        causal=kg.choice([1, 0.75, 0.5, 0.25, 0.1, 0])),
                "clip": lambda e, kg: percentile_clip(e, 100 * kg.choice([0.5, 0.75, 0.9, 0.95, 0.975, 0.99])),
                "compress": lambda e, kg: compress(e, kg.choice([0.1, 0.25, 0.5, 0.75, 0.9]),
                                                   kg.choice([0.9, 0.75, 0.666, 0.5])),
                "expand": lambda e, kg: expand(e, kg.choice([0.1, 0.25, 0.5, 0.75, 0.9]),
                                               kg.choice([1.5, 2, 3, 4, 8]))}
_LAYER_BANDS = {"full": (0, 18), "low": (0, 6), "mid": (6, 12), "high": (12, 18)}


class _Rand:
    """Seeded choice helper (explicit reproducibility, patch.py:41-43)."""

    def __init__(self, seed: int):
        self.rs = np.random.RandomState(seed)

    def choice(self, opts):
        return opts[int(self.rs.randint(len(opts)))]


class RandomPatch:
    """One randomized audioreactive mapping: audio source -> band filter ->
    feature envelope -> postprocess -> latent/noise target over a W+ layer
    band (ssar/patches/random_patches.py:310-440)."""

    def __init__(self, seed: int = 0, fps: float = 24):
        kg = _Rand(seed)
        self.fps = fps
        self.seed = seed
        self.which_audio = kg.choice(["full", "harmonic", "percussive"])
        self.which_filtering = kg.choice(["none", "low", "low-mid", "mid", "high-mid", "high"])
        self.which_input = kg.choice(["latent", "noise"])
        feats = (["volume", "onsets", "tempo"] if self.which_audio == "percussive"
                 else ["volume", "onsets", "pitch_track", "tempo", "chroma", "tonnetz"])
        if self.which_input == "noise" and "pitch_track" in feats:
            feats.remove("pitch_track")
        self.which_feature = kg.choice(feats)
        self.which_postprocess = ("none" if self.which_feature in ("tempo", "pitch_track")
                                  else kg.choice(list(_POSTPROCESS)))
        self.which_layers = kg.choice(list(_LAYER_BANDS))
        self._kg = kg

    def __repr__(self):
        return (f"RandomPatch(seed={self.seed}, audio={self.which_audio}, "
                f"filter={self.which_filtering}, input={self.which_input}, "
                f"feature={self.which_feature}, post={self.which_postprocess}, "
                f"layers={self.which_layers})")

    def forward(self, audio, sr: int, palette: jax.Array, base_latents: jax.Array,
                noise_size: tuple[int, int] = (32, 32)):
        """-> ("latent", (T, n_ws, 512)) or ("noise", (T, H, W))."""
        audio = jnp.asarray(audio, jnp.float32)
        n_frames = base_latents.shape[0]
        a = _SOURCES[self.which_audio](audio, sr)
        a = _FILTERS[self.which_filtering](a, sr)
        key = jax.random.PRNGKey(self.seed)

        if self.which_feature == "tempo":
            bpm = tempo(a, sr)
            n_bars = self._kg.choice([1, 2, 4, 8, 16, 32])
            if self.which_input == "latent":
                out = TempoLoopLatents(bpm, palette, n_frames, self.fps, n_bars,
                                       type=self._kg.choice(list(LOOP_TYPES)),
                                       smooth=self._kg.choice([1, 2, 4, 8, 16, 32]))
            else:
                out = TempoLoopNoise(key, bpm, noise_size, n_frames, self.fps, n_bars)
            return self.which_input, self._band_blend(out, base_latents)

        if self.which_feature == "pitch_track":
            pc = pitch_track(a, sr, n_frames)
            return "latent", self._band_blend(PitchTrackLatents(pc, palette), base_latents)

        if self.which_feature in ("chroma", "tonnetz"):
            ch = chroma(a, sr, n_frames) if self.which_feature == "chroma" else \
                normalize(tonnetz(a, sr, n_frames))
            if self.which_input == "latent":
                return "latent", self._band_blend(TonalLatents(ch, palette), base_latents)
            return "noise", TonalNoise(key, ch, noise_size)

        env = (onsets(a, sr, n_frames) if self.which_feature == "onsets"
               else volume(a, sr, n_frames))
        env = _POSTPROCESS[self.which_postprocess](env, self._kg)
        if self.which_input == "latent":
            mod = palette[self.seed % palette.shape[0]]
            return "latent", self._band_blend(ModulatedLatents(env, base_latents, mod), base_latents)
        base_n = gaussian_filter(jax.random.normal(key, (n_frames,) + tuple(noise_size)), 8)
        mod_n = jax.random.normal(jax.random.split(key)[1], (n_frames,) + tuple(noise_size))
        return "noise", ModulatedNoise(env, base_n, mod_n)

    def _band_blend(self, new: jax.Array, base: jax.Array) -> jax.Array:
        if new.ndim != 3 or base.ndim != 3:  # noise targets pass through
            return new
        lo, hi = _LAYER_BANDS[self.which_layers]
        lo, hi = min(lo, base.shape[1]), min(hi, base.shape[1])
        return base.at[:, lo:hi].set(new[:, lo:hi])


# ------------------------------------------------------------- plotting --
def plot_signals(signals, out_file: str | None = None):
    """Stacked line plots of authoring envelopes (ar.plot_signals).  Saves
    to ``out_file`` when given, else to ``output/signals.pdf``."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    signals = [np.asarray(s, np.float32).reshape(len(s), -1) for s in signals]
    fig, axes = plt.subplots(len(signals), 1, figsize=(12, 2 * len(signals)), squeeze=False)
    for ax, sig in zip(axes[:, 0], signals):
        ax.plot(sig)
        ax.set_xlim(0, len(sig))
    fig.tight_layout()
    out_file = out_file or "output/signals.pdf"
    Path(out_file).parent.mkdir(parents=True, exist_ok=True)
    fig.savefig(out_file)
    plt.close(fig)
    return out_file


def plot_spectra(spectra, out_file: str | None = None):
    """Stacked (T, C) heatmaps of spectral features (ar.plot_spectra)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    spectra = [np.asarray(s, np.float32) for s in spectra]
    fig, axes = plt.subplots(len(spectra), 1, figsize=(12, 2 * len(spectra)), squeeze=False)
    for ax, spec in zip(axes[:, 0], spectra):
        ax.imshow(spec.T, aspect="auto", origin="lower", interpolation="nearest")
    fig.tight_layout()
    out_file = out_file or "output/spectra.pdf"
    Path(out_file).parent.mkdir(parents=True, exist_ok=True)
    fig.savefig(out_file)
    plt.close(fig)
    return out_file


# ------------------------------------------------------- network bending --
class AddNoise:
    """Traceable bend transform: adds a fixed noise field to a feature map
    (``ar.AddNoise``, ssar/patches/examples/01_intro.py:103).  Accepts the
    reference's NCHW (1, 1, H, W) noise and converts to NHWC."""

    def __init__(self, noise):
        noise = jnp.asarray(noise, jnp.float32)
        if noise.ndim == 4 and noise.shape[1] == 1 and noise.shape[-1] != 1:
            noise = jnp.transpose(noise, (0, 2, 3, 1))  # NCHW -> NHWC
        self.noise = noise

    def __call__(self, x):
        return x + self.noise.astype(x.dtype)


def replication_pad(left: int, right: int, top: int = 0, bottom: int = 0):
    """Edge-replicating spatial pad on NHWC feature maps — the
    ``th.nn.ReplicationPad2d((l, r, t, b))`` of the widescreen-bend idiom
    (pads 4x4 const blocks to 4x8 so every later level renders 2:1)."""

    def pad(x):
        return jnp.pad(x, ((0, 0), (top, bottom), (left, right), (0, 0)), mode="edge")

    return pad


def sequential(*fns):
    """Compose bend transforms left-to-right (th.nn.Sequential equivalent)."""

    def run(x):
        for f in fns:
            x = f(x)
        return x

    return run


# --------------------------------------------------- patch-file contract --
def load_patch_module(path: str) -> types.ModuleType:
    """Import a patch file (initialize/get_latents/get_noise) by path."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(Path(path).stem, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def render_patch(patch_module, audio, sr: int, fps: float = 24, palette=None,
                 synthesizer=None, out_file: str | None = None, audio_file: str | None = None,
                 gan_config=None, batch_size: int = 8):
    """Run a patch file's hooks and (optionally) render the result.

    The contract mirrors ssar/patches/examples/*: ``args`` carries audio,
    sr, fps, n_frames plus anything ``initialize`` attaches; ``get_latents``
    maps a palette selection to (T, n_ws, 512); ``get_noise`` (optional) is
    called per noise scale.  Returns (latents, noises).
    """
    audio = jnp.asarray(audio, jnp.float32)
    args = types.SimpleNamespace(audio=audio, sr=int(sr), fps=fps, audio_file=audio_file,
                                 n_frames=int(audio.shape[-1] // 1024))
    if hasattr(patch_module, "initialize"):
        args = patch_module.initialize(args)

    if palette is None:
        from ..gan.wrapper import StyleGAN2Mapper

        mapper = StyleGAN2Mapper(config=gan_config)
        palette = mapper(jax.random.normal(jax.random.PRNGKey(42), (12, 512)))
    else:
        mapper = None
    latents = patch_module.get_latents(jnp.asarray(palette), args)

    if hasattr(patch_module, "get_truncation"):
        # per-frame truncation psi pulling W+ toward the mean latent
        # (reference ssar/patches/examples/tvgfIImix.py:630-653 +
        # ssar/models/stylegan2.py:552-556). With a live mapper the anchor is
        # the Monte-Carlo mean W; with a user palette, its mean row.
        trunc = jnp.asarray(patch_module.get_truncation(args), jnp.float32).reshape(-1)
        T = latents.shape[0]
        trunc = jnp.pad(trunc[:T], (0, max(0, T - trunc.shape[0])), mode="edge")
        w_avg = (mapper.mean_latent() if mapper is not None
                 else jnp.asarray(palette).mean(0, keepdims=True))  # (1, n_ws, 512)
        latents = w_avg + trunc[:, None, None] * (latents - w_avg)

    noises = None
    if hasattr(patch_module, "get_noise") and synthesizer is not None:
        noises = []
        for i, (h, w) in enumerate(synthesizer.config.noise_shapes()[: synthesizer.n_noises_used]):
            n = patch_module.get_noise(h, w, scale=i, num_scales=synthesizer.n_noises_used, args=args)
            if n is None:
                # reference patches return None for unwanted scales
                # (ssar/patches/examples/01_intro.py et al.) — keep the slot
                # and let the synthesizer fall back to its stored noise
                noises.append(None)
            elif callable(n) and not isinstance(n, (np.ndarray, jax.Array)):
                noises.append(n)  # lazy Noise module, evaluated per render chunk
            else:
                noises.append(np.asarray(n)[:, None] if np.asarray(n).ndim == 3 else np.asarray(n))

    if synthesizer is not None:
        if hasattr(patch_module, "get_bends"):
            synthesizer.set_bends(patch_module.get_bends(args))
        else:
            # a synthesizer reused across render_patch calls must not keep the
            # previous patch's bends installed
            synthesizer.set_bends({})

    if synthesizer is not None and out_file is not None:
        from ..gan.render import render_latents_to_video

        render_latents_to_video(synthesizer, latents, noises, out_file, fps=fps,
                                audio_file=audio_file, batch_size=batch_size, progress=False)
    return latents, noises

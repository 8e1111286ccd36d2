"""Test-time optimization: HiPPO envelopes maximising audio-reactivity.

Equivalent of ssar/optimize.py:244-420 — the third generation paradigm
(SURVEY.md §2.7): a HiPPO-parameterized envelope timeseries drives a
winner-takes-all FixedLatentNoiseDecoder; Adam + cosine LR maximises the
RV2 correlation between every prediction (envelopes, latents, noise) and
every audio feature, with per-prediction gradient normalisation.

TPU design: the whole optimisation step (decode -> predictions -> RV2 sum
-> grad -> Adam update) is ONE jitted program; features and decoder palette
are closed-over constants.  Rendering evals reuse gan/render.py.
"""
from __future__ import annotations

import argparse
from functools import partial
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..audio import features as FT
from ..models.hippo import HiPPOTimeseries
from ..ops.gaussian import gaussian_filter
from ..train.losses import normalize_gradients, orthogonal_procrustes_distance

AFNS = [FT.chromagram, FT.tonnetz, FT.mfcc, FT.spectral_contrast, FT.rms, FT.drop_strength, FT.onsets]


def autocorrelation(A: jax.Array) -> jax.Array:
    """Standardised time-domain Gram matrix (ssar/optimize.py:145-149)."""
    A = A - jnp.mean(A, axis=0)
    A = A / (jnp.std(A, axis=0) + 1e-8)
    A = A.reshape(A.shape[0], -1)
    return A @ A.T


def rv2(X: jax.Array, Y: jax.Array) -> jax.Array:
    """RV2 on standardised autocorrelations (ssar/optimize.py:152-160)."""
    XX = autocorrelation(X)
    XX = XX - jnp.diag(jnp.diag(XX))
    YY = autocorrelation(Y)
    YY = YY - jnp.diag(jnp.diag(YY))
    return jnp.trace(XX.T @ YY) / jnp.sqrt(jnp.trace(XX.T @ XX) * jnp.trace(YY.T @ YY) + 1e-12)


def abscos(X: jax.Array, Y: jax.Array) -> jax.Array:
    """Absolute cosine between autocorrelations (ssar/optimize.py:163-170)."""
    XX = autocorrelation(X)
    XX = XX / (jnp.linalg.norm(XX) + 1e-12)
    YY = autocorrelation(Y)
    YY = YY / (jnp.linalg.norm(YY) + 1e-12)
    return jnp.abs(jnp.sum(XX * YY))


def lap_loss_host(target: np.ndarray, prediction: np.ndarray) -> float:
    """Segmentation-matching MSE after optimal label assignment.

    The reference runs an auction LAP solver on-device
    (ssar/optimize.py:172-241); label assignment is a tiny k x k problem, so
    the TPU-native choice is scipy's Hungarian solver on host.
    """
    from scipy.optimize import linear_sum_assignment

    cost = target.T @ prediction  # (k, k)
    _, cols = linear_sum_assignment(-cost)
    return float(np.mean((prediction[:, cols] - target) ** 2))


def sinkhorn_assignment(cost: jax.Array, n_iters: int = 30, temp: float = 0.05) -> jax.Array:
    """Doubly-stochastic soft assignment maximising total cost (k, k).

    On-device, fixed-iteration replacement for the reference's auction LAP
    solver (ssar/optimize.py:172-220) — the same iterative-bidding idea, but
    expressed as Sinkhorn normalisation so it jits to pure XLA ops.
    """
    logit = cost / temp

    def body(l, _):
        l = l - jax.nn.logsumexp(l, axis=1, keepdims=True)
        l = l - jax.nn.logsumexp(l, axis=0, keepdims=True)
        return l, None

    logit, _ = jax.lax.scan(body, logit, None, length=n_iters)
    return jnp.exp(logit)


def lap_loss(target: jax.Array, prediction: jax.Array) -> jax.Array:
    """Differentiable segmentation-matching loss (ssar/optimize.py:223-241).

    target / prediction: (T, k) soft one-hot segmentations.  The label
    permutation is solved with a (stop-gradient) Sinkhorn assignment, then
    an MSE is taken between the permuted prediction and the target so
    gradients flow through the segmentation values, matching the
    reference's hard auction-LAP + MSE semantics.
    """
    cost = target.T @ prediction  # (k, k) overlap
    P = jax.lax.stop_gradient(sinkhorn_assignment(cost))
    return jnp.mean((prediction @ P.T - target) ** 2)


class FixedLatentNoiseDecoderOpt:
    """Winner-takes-all grouped decoder (ssar/optimize.py:103-142).

    Envelopes (T, S*G*H + 2*n_noise): each latent split softmaxes over its
    (G, H) group structure before mixing palette latents; noise (mu, sigma)
    pairs scale time-smoothed randn at 4x4..2^(n_noise+1).
    """

    def __init__(self, latents: jax.Array, n_latent_split=1, n_latent_groups=1,
                 n_latent_per_group=6, n_noise=6, rng: jax.Array | None = None):
        self.S, self.G, self.H = n_latent_split, n_latent_groups, n_latent_per_group
        assert latents.shape[0] == self.S * self.G * self.H
        self.latents = latents
        self.W = latents.shape[1] // self.S
        self.n_noise = n_noise
        self.rng = jax.random.PRNGKey(0) if rng is None else rng

    def noise_bases(self, T: int):
        bases = []
        rng = self.rng
        for i in range(self.n_noise):
            rng, k = jax.random.split(rng)
            size = 2 ** (i + 2)
            n = jax.random.normal(k, (T, size, size))
            bases.append(gaussian_filter(n, 2))
        return bases

    def __call__(self, x: jax.Array, noise_bases):
        S, G, H, W = self.S, self.G, self.H, self.W
        latents = []
        for i in range(S):
            env = x[:, i * (G * H) : (i + 1) * (G * H)].reshape(-1, G, H)
            env = jax.nn.softmax(env, axis=2)
            env = env / (jnp.sum(env, axis=(1, 2), keepdims=True) + 1e-8)
            lat = jax.lax.stop_gradient(
                self.latents[i * (G * H) : (i + 1) * (G * H), i * W : (i + 1) * W]
            ).reshape(G, H, W, self.latents.shape[-1])
            latents.append(jnp.einsum("TGH,GHWL->TWL", env, lat))
        latents = jnp.concatenate(latents, axis=1)

        noise_envs = x[:, S * G * H :]
        noise = []
        for i in range(self.n_noise):
            mu = noise_envs[:, 2 * i][:, None, None]
            sig = noise_envs[:, 2 * i + 1][:, None, None]
            noise.append(mu + sig * noise_bases[i])
        return latents, noise


def optimize(audio_file: str | None = None, fps: int = 24, n_steps: int = 512, n_params: int = 512,
             n_latent_split: int = 1, n_latent_groups: int = 1, n_latent_per_group: int = 6,
             n_noise: int = 6, lr: float = 1e-3, log_steps: int = 16, eval_steps: int = 128,
             lambda_rv2: float = 1.0, prediction_similarity_penalty: float = 0.0,
             objective: str = "rv2", norm_grads: bool = True,
             out_dir: str = "output/optimization", seed: int = 42,
             audio: np.ndarray | None = None, sr: int | None = None,
             model_file: str | None = None, render: bool = False,
             gan_config=None, max_seconds: float = 40.0,
             palette: jax.Array | None = None, interp: jax.Array | None = None,
             emphasize_feature: str | None = None,
             feature_weight_boosts: dict | None = None,
             use_audio_segmentation_features: bool = False,
             lambda_lap: float = 0.0, ks=(2, 4, 6, 8, 12, 16),
             lambda_amplitude: float = 0.0, target_latent_step: float = 0.048):
    """Returns (envelopes (T, E), latents (T, n_ws, 512), noise list, losses).

    Optional reference behaviours (ssar/optimize.py:244-346,
    comparison.py:98-142):

    - ``palette``: pre-mapped W+ palette for the decoder instead of mapping
      RandomState(42) z's.
    - ``interp``: residual base walk — final latents are re-centred around it
      (latents - mean + interp, comparison.py:205-208).
    - ``emphasize_feature``: multiply that feature's RV2 weight by 10.
    - ``feature_weight_boosts``: extra per-feature weight multipliers (the
      comparison harness uses onsets x3, rms x10, drop_strength x10,
      rosa_segmentation x2, comparison.py:138-141).
    - ``use_audio_segmentation_features``: add the hard rosa-flavour
      laplacian segmentation as an extra feature with max weight.
    - ``lambda_lap``: segmentation-matching loss between on-device laplacian
      segmentations of each prediction and the audio features' segmentations
      (Sinkhorn assignment replaces the auction LAP solver).
    - ``objective``: ``"rv2"`` is the standalone optimizer's loss
      (ssar/optimize.py:326-346); ``"procrustes"`` is the comparison
      harness's variant (comparison.py:176-199), which minimises the
      weighted per-feature orthogonal procrustes distance — i.e. directly
      the audio-reactivity metric the study scores — over raw (un-grad-
      normalised when ``norm_grads=False``, the comparison default)
      envelope/latent/noise predictions.
    - ``lambda_amplitude`` (opt-in, default 0 = reference-faithful): both
      objectives are scale-invariant, so a microscopic correlated wiggle
      optimizes them exactly as well as a visible one — the diagnosed cause
      of ssopt's 25x under-movement (docs/STUDY.md r4 §4; the reference's
      variant shares the flaw, ssar/comparison.py:176-199).  This term adds
      a squared relative error between the mean frame-to-frame latent step
      and ``target_latent_step`` (default 0.048, the patch system's
      measured step from the round-4 study), pinning the solution to a
      VISIBLE motion amplitude without touching its correlation structure.
    """
    from ..gan.wrapper import StyleGAN2Mapper

    if audio is None:
        from ..train.data import load_audio

        audio, sr = load_audio(audio_file)
    audio = np.asarray(audio)[: int(max_seconds * sr)]
    target_sr = 1024 * fps
    if sr != target_sr:
        from ..ops.resample import resample

        audio = np.asarray(resample(jnp.asarray(audio), int(sr), target_sr, lowpass_filter_width=6))
        sr = target_sr
    audio_j = jnp.asarray(audio, jnp.float32)

    features = {fn.__name__: fn(audio_j, sr) for fn in AFNS}
    n_frames = int(features["rms"].shape[0])

    feature_weights = {}
    for name, f in features.items():
        ac = autocorrelation(f)
        ac = ac - jnp.min(ac)
        span = float(jnp.max(ac))
        if span < 1e-6:  # constant feature (degenerate audio): carries no signal
            feature_weights[name] = 0.0
            continue
        w = float(1.0 / (jnp.mean(ac / span) + 1e-8))
        feature_weights[name] = w if np.isfinite(w) else 1.0

    if use_audio_segmentation_features:
        from ..audio.segment import laplacian_segmentation_rosa

        labels = laplacian_segmentation_rosa(audio, sr, n_frames, ks=ks)
        features["rosa_segmentation"] = jnp.asarray(labels, jnp.float32)
        feature_weights["rosa_segmentation"] = max(feature_weights.values())
    if emphasize_feature is not None:
        feature_weights[emphasize_feature] *= 10.0
    for name, boost in (feature_weight_boosts or {}).items():
        if name in feature_weights:
            feature_weights[name] *= boost

    n_envelopes = n_latent_split * n_latent_groups * n_latent_per_group + 2 * n_noise
    hippo = HiPPOTimeseries(n_frames, n_envelopes, N=n_params)
    init_f = jax.random.uniform(jax.random.PRNGKey(seed), (n_frames, n_envelopes))
    params = hippo.init_params(init_f)

    if palette is None:
        mapper = StyleGAN2Mapper(model_file=model_file, config=gan_config, seed=seed)
        z = np.random.RandomState(42).randn(n_latent_split * n_latent_groups * n_latent_per_group, 512)
        palette = mapper(z.astype(np.float32))
    else:
        palette = jnp.asarray(palette)[: n_latent_split * n_latent_groups * n_latent_per_group]
    decoder = FixedLatentNoiseDecoderOpt(palette, n_latent_split, n_latent_groups,
                                         n_latent_per_group, n_noise,
                                         rng=jax.random.PRNGKey(seed))
    noise_bases = decoder.noise_bases(n_frames)

    schedule = optax.cosine_decay_schedule(lr, n_steps, alpha=0.01)
    optimizer = optax.adam(schedule)
    opt_state = optimizer.init(params)

    feat_list = [(name, features[name], feature_weights[name]) for name in features]

    beats, feature_segmentations = None, None
    if lambda_lap:
        from ..audio.beat import onset_strength
        from ..audio.beat_host import beat_track
        from ..audio.segment import laplacian_segmentation

        env = np.asarray(onset_strength(audio_j, sr))
        _, beats = beat_track(env, sr=sr, hop_length=1024)
        beats = [int(b) for b in beats if 0 < b < n_frames]
        feature_segmentations = {}
        for name, f in features.items():
            if "segmentation" in name:  # hard labels -> per-k one-hots
                feature_segmentations[name] = [
                    jax.nn.one_hot(f[:, i].astype(jnp.int32), k)
                    for i, k in enumerate(ks)]
            else:
                feature_segmentations[name] = laplacian_segmentation(
                    f.reshape(n_frames, -1), beats, ks=ks)

    # Feature bank for the procrustes objective, prepared once: each feature
    # centred over time, unit-frobenius, and zero-PADDED to a common width.
    # Zero columns change neither the centring, the norm, nor the nuclear
    # norm of the cross-covariance, so the padded bank scores identically —
    # but it turns |preds| x |features| separate procrustes graphs (a
    # compile-time monster: 49 eigh-with-grad subgraphs) into ONE batched
    # matmul + batched eigvalsh per prediction, the MXU-friendly layout.
    if objective == "procrustes":
        if lambda_lap or prediction_similarity_penalty or lambda_rv2 != 1.0:
            import warnings

            warnings.warn(
                "objective='procrustes' ignores lambda_lap, "
                "prediction_similarity_penalty and lambda_rv2 — these only "
                "apply to the rv2 objective (ssar/optimize.py:326-346)",
                stacklevel=2)
        f_width = max(int(np.prod(f.shape[1:])) for _, f, _ in feat_list)
        f_bank = []
        for _, f, _ in feat_list:
            y = f.reshape(n_frames, -1).astype(jnp.float32)
            y = y - jnp.mean(y, axis=0, keepdims=True)
            y = y / (jnp.linalg.norm(y) + 1e-12)
            f_bank.append(jnp.pad(y, ((0, 0), (0, f_width - y.shape[1]))))
        f_bank = jnp.stack(f_bank)  # (F, T, f_width)
        f_w = jnp.asarray([w for _, _, w in feat_list], jnp.float32)

    def procrustes_bank_loss(pred):
        """sum_f w_f * (1 - ||x̄ᵀȳ_f||_*) for one prediction vs the bank."""
        x = pred - jnp.mean(pred, axis=0, keepdims=True)
        x = x / (jnp.linalg.norm(x) + 1e-12)
        a = jnp.einsum("td,fte->fde", x, f_bank)  # (F, Dp, f_width)
        m = jnp.einsum("fde,fdg->feg", a, a)  # small-side Gram (F, fw, fw)
        ev = jnp.linalg.eigvalsh(m)
        nuc = jnp.sum(jnp.sqrt(jnp.clip(ev, 0.0) + 1e-24), axis=-1)  # (F,)
        return jnp.sum(f_w * (1.0 - nuc))

    def amplitude_penalty(latents):
        """Squared relative error of mean |Δlatent| vs target_latent_step.
        Bounded gradient as step -> 0 (unlike a log ratio), symmetric push
        toward the target from either side."""
        step = jnp.mean(jnp.abs(jnp.diff(latents.reshape(n_frames, -1), axis=0)))
        return ((step - target_latent_step) / target_latent_step) ** 2

    def loss_fn(p):
        envs = hippo.decode(p)
        latents, noise = decoder(envs, noise_bases)
        amp = lambda_amplitude * amplitude_penalty(latents) if lambda_amplitude else 0.0
        if objective == "procrustes":
            preds = ([envs.reshape(n_frames, -1), latents.reshape(n_frames, -1)]
                     + [n.reshape(n_frames, -1) for n in noise])
            if norm_grads:  # comparison.py:183-188 (off by default there)
                preds = ([normalize_gradients(preds[0], 1.0),
                          normalize_gradients(preds[1], 1.0)]
                         + [normalize_gradients(n, 1.0 / len(noise)) for n in preds[2:]])
            loss = 0.0
            for pred in preds:
                loss = loss + procrustes_bank_loss(pred)
            return loss + amp
        predictions = ([normalize_gradients(envs, 1.0)]
                       + [normalize_gradients(latents, 10.0)]
                       + [normalize_gradients(n, 0.25) for n in noise])
        loss = 0.0
        for pred in predictions:
            for _, f, w in feat_list:
                loss = loss + lambda_rv2 * w * (1.0 - rv2(pred, f))
            if lambda_lap:
                from ..audio.segment import laplacian_segmentation

                pred_segs = laplacian_segmentation(pred.reshape(n_frames, -1), beats, ks=ks)
                for name, _, _ in feat_list:
                    for tgt, ps in zip(feature_segmentations[name], pred_segs):
                        loss = loss + lambda_lap * lap_loss(tgt, ps) / len(ks)
        if prediction_similarity_penalty:
            for i in range(len(predictions)):
                for j in range(i + 1, len(predictions)):
                    loss = loss + prediction_similarity_penalty * abscos(predictions[i], predictions[j])
        return loss + amp

    # Fused multi-step driver: `log_steps` optimizer steps per device call
    # via lax.scan, ONE host loss-fetch per chunk.  The per-step python loop
    # cost 512 tunnel round-trips per track in the round-3 study (five-minute
    # faulthandler stalls in its log); chunking divides that by log_steps.
    from functools import partial

    @partial(jax.jit, static_argnames="k")
    def run_chunk(p, o, k):
        def body(carry, _):
            p, o = carry
            loss, grads = jax.value_and_grad(loss_fn)(p)
            updates, o = optimizer.update(grads, o, p)
            return (optax.apply_updates(p, updates), o), loss

        (p, o), chunk_losses = jax.lax.scan(body, (p, o), None, length=k)
        return p, o, chunk_losses

    losses = []
    out_base = Path(out_dir) / f"hippo_{Path(audio_file).stem if audio_file else 'synthetic'}_{seed}"
    out_base.parent.mkdir(parents=True, exist_ok=True)
    it = 0
    while it < n_steps:
        k = min(log_steps, n_steps - it)
        if render:
            # never scan past an eval boundary: eval_steps need not be a
            # multiple of log_steps, and `it % eval_steps == 0` below would
            # silently miss renders otherwise (advisor r4)
            k = min(k, eval_steps - it % eval_steps)
        params, opt_state, chunk_losses = run_chunk(params, opt_state, k)
        host_losses = np.asarray(chunk_losses)  # single host sync per chunk
        losses.append(float(host_losses[0]))  # loss at step `it`, same cadence as before
        print(f"step {it}: loss {losses[-1]:.4f}")
        it += k
        if render and it % eval_steps == 0:
            envs = hippo.decode(params)
            latents, noise = decoder(envs, noise_bases)
            _render_eval(audio_file, latents, noise, f"{out_base}_{it}.mp4", model_file,
                         fps, gan_config)

    envs = hippo.decode(params)
    latents, noise = decoder(envs, noise_bases)
    if interp is not None:  # re-centre around a provided base walk (comparison.py:205-208)
        interp = jnp.asarray(interp)
        if interp.ndim == 2:  # (T, 512) w walk -> broadcast over the W+ axis
            interp = interp[:, None, :]
        if interp.shape[1] > latents.shape[1]:
            # the split decoder emits S*(n_latent//S) W+ rows, which at
            # non-power-of-3 n_latent (e.g. 14 at 256px) is fewer than a
            # mapper-produced walk's; align on the shared rows (synthesis
            # clamp-gathers missing trailing rows from the last one anyway)
            interp = interp[:, : latents.shape[1]]
        latents = latents - jnp.mean(latents, axis=0) + interp
    return envs, latents, noise, losses


def _render_eval(audio_file, latents, noise, out_file, model_file, fps, gan_config):
    from ..gan.render import render_latents_to_video
    from ..gan.wrapper import StyleGAN2Synthesizer

    syn = StyleGAN2Synthesizer(model_file=model_file, config=gan_config)
    # duplicate the pyramid into per-layer noises (ssar/optimize.py:52: n0, n1, n1, n2, n2, ...)
    noise_nchw = [np.asarray(n)[:, None] for n in noise]
    dup = [noise_nchw[0]] + [n for nn in noise_nchw[1:] for n in (nn, nn)]
    render_latents_to_video(syn, latents, dup[: syn.n_noises_used], out_file, fps=fps,
                            audio_file=audio_file, progress=False)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--audio_file", type=str, default=None)
    p.add_argument("--fps", type=int, default=24)
    p.add_argument("--n_steps", type=int, default=512)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--smoke", action="store_true")
    p.add_argument("--config", type=str, default=None,
                   help="JSON config file; explicit CLI flags override it")
    args = p.parse_args(argv)
    if args.config:
        from ..utils.config import apply_config_file

        args = apply_config_file(p, args, args.config, argv)


    if args.smoke:
        sr = 1024 * 12
        t = np.arange(sr * 4) / sr
        audio = (0.4 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
        audio[:: sr // 2] += 1.0
        envs, latents, noise, losses = optimize(audio=audio, sr=sr, fps=12, n_steps=32,
                                                n_params=128, log_steps=8,
                                                gan_config=__import__("ssar_tpu.gan.stylegan2",
                                                                      fromlist=["StyleGAN2Config"]).StyleGAN2Config(resolution=64))
        print("losses:", [f"{l:.3f}" for l in losses])
        print("shapes:", envs.shape, latents.shape, [n.shape for n in noise])
        assert losses[-1] < losses[0]
        return
    optimize(audio_file=args.audio_file, fps=args.fps, n_steps=args.n_steps, lr=args.lr)


if __name__ == "__main__":
    main()

"""Train a LatentNoiseReactor — pjit data-parallel, three loss modes.

Equivalent of ``python -m ssar.train`` (ssar/train.py:196-382), redesigned
for TPU:

- the train step is one jitted program over a (data,) device mesh; the batch
  is sharded on its leading axis and XLA inserts the gradient psum over ICI,
- losses: "supervised" (MSE on latents + noise pyramid), "selfsupervised"
  (procrustes between predictions and input features), "ssabsdiff"
  (procrustes on absdiff envelopes, the reference's Triton-kernel loss,
  here the pallas/XLA absdiff with its custom VJP),
- Orbax checkpointing with explicit pytrees (replaces joblib pickles +
  code-snapshot archaeology, SURVEY.md §5.4),
- TensorBoard scalars via tensorboardX when available, CSV fallback.

Run ``python -m ssar_tpu.train.train --smoke`` for a tiny synthetic run.
"""
from __future__ import annotations

import argparse
import json
import time
from functools import partial
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models.reactor import LatentNoiseReactor
from ..ops.absdiff import absdiff_ref
from ..parallel.mesh import get_mesh, replicate, shard_batch
from .data import compute_stats, load_cached, prefetch, synthetic_dataset
from .losses import audio_reactive_loss, supervised_loss


def make_model(args, mean, std, palette):
    # constants stay HOST numpy: trace-time lowering embeds module constants
    # via np.asarray, and a device-resident constant forces a D2H fetch per
    # jit lowering (~100 s each through the tunneled runtime — measured;
    # three of them made the T=192 train step appear to hang)
    return LatentNoiseReactor(
        input_mean=np.asarray(mean), input_std=np.asarray(std),
        latents=None if args.decoder == "learned" else np.asarray(palette),
        residual=args.residual, num_layers=args.num_layers, backbone=args.backbone,
        hidden_size=args.hidden_size, decoder=args.decoder,
        n_latent_split=args.n_latent_split, n_noise=4, dropout=args.dropout,
        env_guard_eps=args.env_guard_eps,
    )


def batch_absdiff(x: jax.Array) -> jax.Array:
    """vmap(absdiff) over the batch axis (ssar/train.py:33)."""
    return jax.vmap(absdiff_ref)(x)


def make_train_step(model, optimizer, loss_mode: str):
    def loss_fn(params, batch, rngs):
        inputs, latents, n4, n8, n16, n32 = batch
        preds_lat, preds_noise = model.apply(params, inputs, deterministic=False, rngs=rngs)
        if loss_mode == "supervised":
            loss = supervised_loss(preds_lat, preds_noise, latents, [n4, n8, n16, n32])
        elif loss_mode == "selfsupervised":
            preds = [preds_lat] + list(preds_noise)
            loss = jnp.mean(audio_reactive_loss(preds, [inputs]))
        elif loss_mode == "ssabsdiff":
            preds = [batch_absdiff(p)[..., None] for p in [preds_lat] + list(preds_noise)]
            loss = jnp.mean(audio_reactive_loss(preds, [inputs]))
        else:
            raise ValueError(loss_mode)
        return loss

    @jax.jit
    def train_step(params, opt_state, batch, key):
        nkey, dkey, key = jax.random.split(key, 3)
        rngs = {"noise": nkey, "dropout": dkey}
        loss, grads = jax.value_and_grad(loss_fn)(params, batch, rngs)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, key

    @jax.jit
    def train_step_gather(params, opt_state, data, sel, key):
        """Device-resident data path: `data` lives in HBM across steps (jit
        args are passed by reference) and the batch is gathered INSIDE the
        program.  The per-step host->device traffic is one int32 index
        vector instead of the full batch — the upload of a (32, 192, 18,
        512) target batch every step made training H2D-bound on slow
        interconnects."""
        batch = tuple(jnp.take(a, sel, axis=0) for a in data)
        return train_step(params, opt_state, batch, key)

    @jax.jit
    def train_step_scan(params, opt_state, data, sels, key):
        """K fused optimiser steps in ONE dispatch: `sels` is (K, B) int32
        and lax.scan runs the gather+step body K times on device.  One
        program submission per step left throughput dispatch-bound on
        high-latency runtimes (~13 ms device step under ~90 ms of tunnel
        round trips → ~300 ex/s); fusing K=64 steps amortises the round
        trip to ~1.4 ms/step.  Key evolution and gather order are
        identical to stepping train_step_gather K times."""
        def body(carry, sel):
            params, opt_state, key = carry
            batch = tuple(jnp.take(a, sel, axis=0) for a in data)
            nkey, dkey, key = jax.random.split(key, 3)
            loss, grads = jax.value_and_grad(loss_fn)(params, batch,
                                                      {"noise": nkey, "dropout": dkey})
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state, key), loss

        (params, opt_state, key), losses = jax.lax.scan(body, (params, opt_state, key), sels)
        return params, opt_state, losses, key

    @jax.jit
    def eval_step(params, batch, key):
        """Loss-mode-aware validation (ssar/train.py:91-148): the val curve
        scores the SAME quantity the run optimises, plus supervised MSE as a
        mode-independent diagnostic, a strided flat sample of the predicted
        latents for the host-side Laplace-b fit (train_a2l.py:299-300), and
        the flattened prediction sequence for FCD."""
        from .losses import supervised_loss_per_example

        inputs, latents, n4, n8, n16, n32 = batch
        preds_lat, preds_noise = model.apply(params, inputs, rngs={"noise": key})
        mse = supervised_loss(preds_lat, preds_noise, latents, [n4, n8, n16, n32])
        # mode_loss is PER-WINDOW (B,): the host medians over windows — the
        # val split is ~one batch, so a batch-level median is just the mean
        if loss_mode == "supervised":
            mode_loss = supervised_loss_per_example(preds_lat, preds_noise, latents,
                                                    [n4, n8, n16, n32])
        elif loss_mode == "selfsupervised":
            preds = [preds_lat] + list(preds_noise)
            mode_loss = audio_reactive_loss(preds, [inputs])
        else:  # ssabsdiff
            preds = [batch_absdiff(p)[..., None] for p in [preds_lat] + list(preds_noise)]
            mode_loss = audio_reactive_loss(preds, [inputs])
        flat = preds_lat.reshape(-1)
        stride = max(1, flat.shape[0] // 8192)
        lat_sample = flat[::stride][:8192]
        fcd_seq = preds_lat.reshape(preds_lat.shape[0], preds_lat.shape[1], -1)
        return mode_loss, mse, lat_sample, fcd_seq

    return train_step, train_step_gather, eval_step, train_step_scan




def _laplace_b(sample: np.ndarray) -> float:
    """Laplace scale MLE of a flat sample (scipy.stats.laplace.fit semantics:
    loc = median, b = mean |x - loc|; ssar/supervised/train_a2l.py:299-300)."""
    sample = np.asarray(sample, np.float64)
    return float(np.mean(np.abs(sample - np.median(sample))))


def _synthetic_test_audio(duration: float, fps: int, seed: int = 0):
    """Deterministic chirp + beat test clip for render-at-checkpoint when no
    --test_audio is given (the reference hard-codes an author-local wav,
    ssar/train.py:264-271)."""
    sr = 1024 * fps
    t = np.arange(int(duration * sr)) / sr
    beat = (np.sin(2 * np.pi * 2.0 * t) > 0.95).astype(np.float32)
    tone = np.sin(2 * np.pi * (220 + 110 * np.sin(2 * np.pi * 0.25 * t)) * t)
    noise = np.random.RandomState(seed).randn(len(t)) * 0.05
    return (0.6 * tone + 0.3 * beat + noise).astype(np.float32), sr


def render_checkpoint_sample(model, params, args, out_file: str, gan_config=None) -> str:
    """The reference renders an audio2video sample at every checkpoint
    (ssar/train.py:353-362); this is the train->render integration point."""
    from ..generate.audio2video import audio2video

    audio, sr, audio_file = None, None, args.test_audio
    if not audio_file:
        audio, sr = _synthetic_test_audio(min(args.duration, 4), args.fps, args.seed)
    size = (args.render_size, args.render_size)
    return audio2video(model, params, audio_file, out_file, model_file=args.stylegan,
                       output_size=size, fps=args.fps, batch_size=8, seed=args.seed,
                       residual=args.residual, gan_config=gan_config,
                       audio=audio, sr=sr)


class MetricsWriter:
    def __init__(self, log_dir: Path):
        log_dir.mkdir(parents=True, exist_ok=True)
        self.csv = open(log_dir / "metrics.csv", "a")
        try:
            from tensorboardX import SummaryWriter

            self.tb = SummaryWriter(str(log_dir))
        except ImportError:
            self.tb = None

    def scalar(self, tag: str, value: float, step: int):
        self.csv.write(f"{step},{tag},{value}\n")
        self.csv.flush()
        if self.tb is not None:
            self.tb.add_scalar(tag, value, step)


def main(argv=None):
    parser = argparse.ArgumentParser(formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    parser.add_argument("--decoder", type=str, default="learned", choices=["learned", "fixed"])
    parser.add_argument("--backbone", type=str, default="gru",
                        choices=["sashimi", "gru", "lstm", "transformer", "conv", "mlp"])
    parser.add_argument("--n_latent_split", type=int, default=3, choices=[1, 2, 3, 6, 9, 18])
    parser.add_argument("--hidden_size", type=int, default=16)
    parser.add_argument("--num_layers", type=int, default=4)
    parser.add_argument("--dropout", type=float, default=0.0)
    parser.add_argument("--duration", type=int, default=8)
    parser.add_argument("--fps", type=int, default=24)
    parser.add_argument("--loss", type=str, default="supervised",
                        choices=["supervised", "selfsupervised", "ssabsdiff"])
    parser.add_argument("--residual", action="store_true")
    parser.add_argument("--n_examples", type=int, default=128_000)
    parser.add_argument("--lr", type=float, default=1e-4)
    parser.add_argument("--grad_clip", type=float, default=1.0,
                        help="global-norm gradient clip; 0 disables (the reference's "
                             "bare Adam, ssar/train.py:262). The fixed decoder's "
                             "env/env.sum normalisation (latent_n_noise2.py:151) has a "
                             "sum≈0 pole that occasionally fires a huge gradient — bare "
                             "Adam diverged at step ~64k on the record grid; clip=1.0 "
                             "trains through it without changing converged losses.")
    parser.add_argument("--batch_size", type=int, default=32)
    parser.add_argument("--env_guard_eps", type=float, default=0.0,
                        help="opt-in fixed-decoder env/env.sum stability guard "
                             "(0 = reference-exact; see models/reactor.py)")
    parser.add_argument("--eval_every", type=int, default=10_240)
    parser.add_argument("--ckpt_every", type=int, default=10_240)
    parser.add_argument("--cache_dir", type=str, default=None, help="preprocessed dataset dir")
    parser.add_argument("--out_dir", type=str, default="runs")
    parser.add_argument("--seed", type=int, default=42)
    parser.add_argument("--resume", type=str, default=None,
                        help="run dir to resume from (restores params, optimizer, RNG key and step)")
    parser.add_argument("--test_audio", type=str, default=None,
                        help="audio file for the render-at-checkpoint sample")
    parser.add_argument("--stylegan", type=str, default=None,
                        help="StyleGAN2 checkpoint for checkpoint renders (.pt/.pkl/.npz)")
    parser.add_argument("--render_size", type=int, default=256)
    parser.add_argument("--render_at_ckpt", action=argparse.BooleanOptionalAction, default=True,
                        help="render an audio2video sample at every checkpoint (ssar/train.py:353-362)")
    parser.add_argument("--fcd", action=argparse.BooleanOptionalAction, default=True,
                        help="compute Frechet Context Distance at each eval window (train_a2l.py:290-304)")
    parser.add_argument("--config", type=str, default=None,
                        help="JSON config file; CLI flags explicitly given override it")
    parser.add_argument("--smoke", action="store_true", help="tiny synthetic run")
    args = parser.parse_args(argv)
    if args.config:
        from ..utils.config import apply_config_file

        args = apply_config_file(parser, args, args.config, argv)

    if args.smoke:  # shrink only values the user didn't set explicitly
        if args.n_examples == parser.get_default("n_examples"):
            args.n_examples = 64 * 4
        if args.batch_size == parser.get_default("batch_size"):
            args.batch_size = 8
        if args.eval_every == parser.get_default("eval_every"):
            args.eval_every = 128
        if args.ckpt_every == parser.get_default("ckpt_every"):
            args.ckpt_every = 128
        if args.render_size == parser.get_default("render_size"):
            args.render_size = 64

    n_frames = args.duration * args.fps
    if args.cache_dir:
        train_ds = load_cached(args.cache_dir, "train")
        val_ds = load_cached(args.cache_dir, "val")
        mean = np.load(Path(args.cache_dir) / "train_mean.npy")
        std = np.load(Path(args.cache_dir) / "train_std.npy")
    else:
        train_ds = synthetic_dataset(n_windows=64, n_frames=n_frames)
        val_ds = synthetic_dataset(n_windows=16, n_frames=n_frames, seed=7)
        mean, std = compute_stats(train_ds.features)

    # frozen W+ palette from the mapper on RandomState(42) z's (ssar/train.py:239-243)
    from ..gan.wrapper import StyleGAN2Mapper

    mapper = StyleGAN2Mapper(seed=0)
    z = np.random.RandomState(42).randn(args.n_latent_split * args.hidden_size, 512).astype(np.float32)
    palette = np.asarray(mapper(z))
    del mapper

    model = make_model(args, mean, std, palette)
    key = jax.random.PRNGKey(args.seed)
    # ONE jitted init program (params are batch-size independent, so init at
    # B=1): eager flax init dispatches hundreds of individually-compiled ops,
    # which on a remote-compile runtime turns setup into tens of minutes
    example = jnp.zeros((1, n_frames, 59), jnp.float32)
    params = jax.jit(model.init)({"params": key, "noise": key}, example)
    n_params = sum(p.size for p in jax.tree.leaves(params))

    optimizer = optax.adam(args.lr)
    if args.grad_clip > 0:
        optimizer = optax.chain(optax.clip_by_global_norm(args.grad_clip), optimizer)
    opt_state = optimizer.init(params)
    train_step, train_step_gather, eval_step, train_step_scan = make_train_step(
        model, optimizer, args.loss)

    mesh = get_mesh()
    params = replicate(params, mesh)
    opt_state = replicate(opt_state, mesh)

    name = "_".join([args.backbone, args.loss, args.decoder,
                     f"split{args.n_latent_split}", f"hid{args.hidden_size}",
                     f"layers{args.num_layers}", f"lr{args.lr}"])
    log_dir = Path(args.out_dir) / f"{name}_{int(time.time())}"
    writer = MetricsWriter(log_dir)
    (log_dir / "config.json").write_text(json.dumps(vars(args)))
    # stats are model constants outside the checkpoint — persist them so
    # load_checkpoint restores the exact normalisation
    np.save(log_dir / "input_mean.npy", np.asarray(mean))
    np.save(log_dir / "input_std.npy", np.asarray(std))
    print(f"model: {n_params/1e3:.1f}K params -> {log_dir}")

    import orbax.checkpoint as ocp

    ckpt_mgr = ocp.CheckpointManager(log_dir.resolve() / "ckpt")

    def ckpt_state(it):
        # FULL training state — params, Adam moments, RNG key, step — so a
        # resumed run continues bitwise where it left off (the reference
        # persists {"model","optim","n_iter"}, ssar/train.py:345-352; round-1
        # checkpoints silently re-initialised Adam on resume)
        return {"params": params, "opt_state": opt_state, "key": key, "step": it}

    start_it = 0
    if args.resume:
        # explicit-schema restore (replaces the reference's pickle +
        # code-snapshot archaeology, SURVEY.md §5.4)
        prev = ocp.CheckpointManager(Path(args.resume).resolve() / "ckpt")
        step = prev.latest_step()
        try:
            restored = prev.restore(step, args=ocp.args.StandardRestore(ckpt_state(0)))
            params, opt_state = restored["params"], restored["opt_state"]
            # round-trip through host so the key is uncommitted (a restored
            # array is pinned to device 0, which conflicts with the
            # mesh-replicated params inside jit)
            key = jnp.asarray(np.asarray(restored["key"]))
            start_it = int(restored["step"])
        except BaseException:
            # round-1 checkpoints hold only {params, step}: restore those and
            # re-init the optimizer (and say so, rather than silently)
            restored = prev.restore(step)
            params = replicate(jax.tree.map(jnp.asarray, restored["params"]), mesh)
            opt_state = optimizer.init(params)
            start_it = int(restored.get("step", step))
            print("WARNING: legacy checkpoint without optimizer state — Adam moments re-initialised")
        print(f"resumed from {args.resume} at step {start_it}")

    # device-resident data when it fits in HBM on a single chip: arrays
    # upload ONCE and each step sends only an int32 index vector; streaming
    # a (B, T, 18, 512) target batch every step is H2D-bound on slow links.
    # Multi-chip meshes keep the host path (per-chip batch shards).
    train_arrays = (train_ds.features, train_ds.latents, *train_ds.noises)
    data_bytes = sum(a.nbytes for a in train_arrays)
    device_data = None
    n_skip = start_it // args.batch_size  # replay the stream to the resumed position
    if mesh.devices.size == 1 and data_bytes < 4e9:
        device_data = tuple(jnp.asarray(a) for a in train_arrays)
        idx_stream = train_ds.index_batches(args.batch_size, seed=args.seed)
        for _ in range(n_skip):
            next(idx_stream)
    else:
        if n_skip and hasattr(train_ds, "index_batches"):
            # skip index vectors, not materialised batches: fast-forwarding
            # through gigabytes of data would stall resume for minutes
            skip_idx = train_ds.index_batches(args.batch_size, seed=args.seed)
            for _ in range(n_skip):
                next(skip_idx)
            raw_batches = train_ds.batches_from(skip_idx)
        else:
            raw_batches = train_ds.batches(args.batch_size, seed=args.seed)
        batches = prefetch(raw_batches)
    print(f"training: {args.n_examples} examples, batch {args.batch_size}, "
          f"{n_frames} frames/window, data "
          f"{'device-resident' if device_data is not None else 'host-streamed'} "
          f"({data_bytes/1e6:.0f} MB)", flush=True)
    diag_apply = jax.jit(lambda p, x: model.apply(p, x, rngs={"noise": jax.random.PRNGKey(0)}))

    # FCD context encoder, fit once on real val latent sequences
    # (ssar/supervised/train_a2l.py:290-304 + context_fid.py:56-70)
    fcd_encode, fcd_real = None, None
    if args.fcd:
        try:
            from ..metrics.context_fid import context_fid, train_encoder

            n_fit = min(len(val_ds), 64)
            fcd_real = np.asarray(val_ds.latents[:n_fit]).reshape(n_fit, n_frames, -1).astype(np.float32)
            fcd_encode = train_encoder(fcd_real, n_steps=40, features=16, embed_dim=32)
        except Exception as e:  # FCD never blocks training
            print(f"FCD encoder unavailable: {e}")

    render_gan_config = None
    if args.stylegan is None:
        from ..gan.stylegan2 import StyleGAN2Config

        res = 1 << int(np.ceil(np.log2(max(32, args.render_size))))
        render_gan_config = StyleGAN2Config(resolution=res)

    pending: list = []  # (iter, device loss) — fetched once per eval window
    flush_window = max(args.batch_size * 256, args.eval_every)

    def flush_pending():
        # entries are (first_it, device scalar | device (K,) vector); fetch
        # once per entry — one sync per fused group, not per step
        losses = []
        for step_i, v in pending:
            arr = np.atleast_1d(np.asarray(v))
            for j, x in enumerate(arr):
                writer.scalar(f"Loss/{args.loss}", float(x), step_i + j * args.batch_size)
                losses.append(float(x))
        pending.clear()
        return losses

    def pending_examples():
        return sum((v.shape[0] if getattr(v, "ndim", 0) else 1)
                   for _, v in pending) * args.batch_size

    K_MAX = 64  # fused steps per dispatch (train_step_scan)

    def steps_until_event(it):
        """How many steps can fuse into one dispatch starting at `it`: the
        group may only END on an eval/ckpt boundary (the original loop
        evals/checkpoints immediately after stepping a boundary `it`)."""
        k = min(K_MAX, (args.n_examples - it + args.batch_size - 1) // args.batch_size)
        for M in (args.eval_every, args.ckpt_every):
            d = (-it) % M
            if d == 0:
                return 1  # current step IS the boundary: run it alone
            if d % args.batch_size == 0:  # boundary reachable by whole steps
                k = min(k, d // args.batch_size + 1)
        return max(k, 1)

    t0 = time.time()
    val_loss = float("nan")
    val_loss_median = float("nan")
    it = start_it
    while it < args.n_examples:
        if device_data is not None:
            # keep the loss ON DEVICE: a float() here would synchronise every
            # step, and on the tunneled runtime the ~25 ms round-trip
            # dominates the 13 ms step (measured 692 -> 2453 ex/s pipelined).
            # Fuse K steps into one lax.scan dispatch: per-step submission
            # left throughput dispatch-bound (~300 ex/s of a 2450 ex/s step).
            k_steps = steps_until_event(it)
            if k_steps > 1:
                sels = jnp.asarray(np.stack([next(idx_stream) for _ in range(k_steps)]),
                                   jnp.int32)
                params, opt_state, loss_vec, key = train_step_scan(
                    params, opt_state, device_data, sels, key)
                pending.append((it, loss_vec))
                it += (k_steps - 1) * args.batch_size  # land on the group's last step
            else:
                sel = jnp.asarray(next(idx_stream), jnp.int32)
                params, opt_state, loss, key = train_step_gather(
                    params, opt_state, device_data, sel, key)
                pending.append((it, loss))
        else:
            batch = tuple(shard_batch(jnp.asarray(b), mesh) for b in next(batches))
            params, opt_state, loss, key = train_step(params, opt_state, batch, key)
            pending.append((it, loss))

        if it % args.eval_every == 0:
            losses = flush_pending()
            vmse, n = 0.0, 0
            vbatch_losses: list[float] = []
            lat_samples, fake_seqs = [], []
            for vbatch in val_ds.batches(args.batch_size, shuffle=False, loop=False):
                mode_l, mse_l, lsamp, fseq = eval_step(
                    params, tuple(jnp.asarray(b) for b in vbatch), key)
                vbatch_losses.extend(np.asarray(mode_l).ravel().tolist())
                vmse += float(mse_l)
                lat_samples.append(np.asarray(lsamp))
                if fcd_encode is not None and n * args.batch_size < 64:
                    fake_seqs.append(np.asarray(fseq))
                n += 1
                if n * args.batch_size >= len(val_ds):
                    break
            val_loss = float(np.mean(vbatch_losses)) if vbatch_losses else float("nan")
            # the supervised loss's unguarded env/env.sum makes per-WINDOW val
            # heavy-tailed (docs/GRID.md); the window median is the robust stat
            val_loss_median = float(np.median(vbatch_losses)) if vbatch_losses else float("nan")
            writer.scalar("Loss/val", val_loss, it)
            writer.scalar("Loss/val_median", val_loss_median, it)
            writer.scalar("Loss/val_mse", vmse / max(n, 1), it)
            # Laplace-b of predicted latents (train_a2l.py:299-300)
            writer.scalar("Eval/laplace_b", _laplace_b(np.concatenate(lat_samples)), it)
            if fcd_encode is not None and fake_seqs:
                try:
                    fake = np.concatenate(fake_seqs)
                    fcd = context_fid(fcd_encode, fcd_real[: len(fake)], fake)
                    writer.scalar("Eval/FCD", float(fcd), it)
                except Exception as e:
                    print(f"FCD skipped: {e}")
            try:  # eval-time autocorrelation diagnostics (ssar/train.py:118-146)
                from ..utils.plot import autocorrelation_grid

                # full batch so diag_apply shares ONE compiled shape across
                # evals (the plot only reads row 0)
                vb = next(val_ds.batches(args.batch_size, shuffle=False))
                # jitted apply: an eager forward here is hundreds of
                # per-op dispatches on the tunneled runtime
                lat, _ = diag_apply(params, jnp.asarray(vb[0]))
                autocorrelation_grid(
                    {"inputs": np.asarray(vb[0][0]),
                     "latents": np.asarray(lat[0]).reshape(lat.shape[1], -1),
                     "targets": np.asarray(vb[1][0]).reshape(vb[1].shape[1], -1)},
                    str(log_dir / f"diagnostics_{it:08d}.png"))
            except Exception as e:  # diagnostics never kill training
                print(f"diagnostics skipped: {e}")
            rate = (it + args.batch_size) / (time.time() - t0)
            train_loss = float(np.mean(losses)) if losses else float("nan")
            print(f"iter {it}  train {train_loss:.4f}  val {val_loss:.4f}  {rate:.1f} ex/s")

        elif pending_examples() >= flush_window:
            # eval_every not aligned to batch_size multiples must not leave
            # scalars buffered for the whole run (TensorBoard stays empty
            # until the final drain otherwise)
            flush_pending()

        if it % args.ckpt_every == 0:
            ckpt_mgr.save(it, args=ocp.args.StandardSave(ckpt_state(it)))
            if args.render_at_ckpt:
                ckpt_mgr.wait_until_finished()
                try:  # render-at-checkpoint (ssar/train.py:353-362)
                    out = render_checkpoint_sample(
                        model, params, args, str(log_dir / f"sample_{it:08d}.mp4"),
                        gan_config=render_gan_config)
                    print(f"checkpoint render: {out}")
                except Exception as e:
                    print(f"checkpoint render skipped: {e}")

        it += args.batch_size

    flush_pending()  # drain the last logging window
    ckpt_mgr.save(args.n_examples, args=ocp.args.StandardSave(ckpt_state(args.n_examples)))
    ckpt_mgr.wait_until_finished()
    if args.render_at_ckpt:
        try:  # the loop's render fires on it % ckpt_every == 0 and the loop
            # ends before it reaches n_examples, so the FINAL checkpoint
            # (the one studies evaluate) must render here
            out = render_checkpoint_sample(
                model, params, args, str(log_dir / f"sample_{args.n_examples:08d}.mp4"),
                gan_config=render_gan_config)
            print(f"final checkpoint render: {out}")
        except Exception as e:
            print(f"final checkpoint render skipped: {e}")
    import json as _json

    (log_dir / "final_metrics.json").write_text(_json.dumps(
        {"val_loss": val_loss, "val_loss_median": val_loss_median}))
    print(f"done: val_loss {val_loss:.4f} (median {val_loss_median:.4f}), "
          f"checkpoints in {log_dir}/ckpt")
    return log_dir, val_loss


if __name__ == "__main__":
    main()

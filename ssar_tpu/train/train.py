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
    def eval_step(params, batch, key):
        inputs, latents, n4, n8, n16, n32 = batch
        preds_lat, preds_noise = model.apply(params, inputs, rngs={"noise": key})
        return supervised_loss(preds_lat, preds_noise, latents, [n4, n8, n16, n32])

    return train_step, train_step_gather, eval_step




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
    parser.add_argument("--batch_size", type=int, default=32)
    parser.add_argument("--eval_every", type=int, default=10_240)
    parser.add_argument("--ckpt_every", type=int, default=10_240)
    parser.add_argument("--cache_dir", type=str, default=None, help="preprocessed dataset dir")
    parser.add_argument("--out_dir", type=str, default="runs")
    parser.add_argument("--seed", type=int, default=42)
    parser.add_argument("--resume", type=str, default=None,
                        help="run dir to resume from (restores params + step)")
    parser.add_argument("--smoke", action="store_true", help="tiny synthetic run")
    args = parser.parse_args(argv)

    if args.smoke:  # shrink only values the user didn't set explicitly
        if args.n_examples == parser.get_default("n_examples"):
            args.n_examples = 64 * 4
        if args.batch_size == parser.get_default("batch_size"):
            args.batch_size = 8
        if args.eval_every == parser.get_default("eval_every"):
            args.eval_every = 128
        if args.ckpt_every == parser.get_default("ckpt_every"):
            args.ckpt_every = 128

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
    opt_state = optimizer.init(params)
    train_step, train_step_gather, eval_step = make_train_step(model, optimizer, args.loss)

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

    start_it = 0
    if args.resume:
        # explicit-schema restore (replaces the reference's pickle +
        # code-snapshot archaeology, SURVEY.md §5.4)
        prev = ocp.CheckpointManager(Path(args.resume).resolve() / "ckpt")
        step = prev.latest_step()
        restored = prev.restore(step)
        params = jax.tree.map(jnp.asarray, restored["params"])
        params = replicate(params, mesh)
        opt_state = optimizer.init(params)
        start_it = int(restored.get("step", step))
        print(f"resumed from {args.resume} at step {start_it}")

    # device-resident data when it fits in HBM on a single chip: arrays
    # upload ONCE and each step sends only an int32 index vector; streaming
    # a (B, T, 18, 512) target batch every step is H2D-bound on slow links.
    # Multi-chip meshes keep the host path (per-chip batch shards).
    train_arrays = (train_ds.features, train_ds.latents, *train_ds.noises)
    data_bytes = sum(a.nbytes for a in train_arrays)
    device_data = None
    if mesh.devices.size == 1 and data_bytes < 4e9:
        device_data = tuple(jnp.asarray(a) for a in train_arrays)
        idx_stream = train_ds.index_batches(args.batch_size, seed=args.seed)
    else:
        batches = prefetch(train_ds.batches(args.batch_size, seed=args.seed))
    print(f"training: {args.n_examples} examples, batch {args.batch_size}, "
          f"{n_frames} frames/window, data "
          f"{'device-resident' if device_data is not None else 'host-streamed'} "
          f"({data_bytes/1e6:.0f} MB)", flush=True)
    diag_apply = jax.jit(lambda p, x: model.apply(p, x, rngs={"noise": jax.random.PRNGKey(0)}))
    pending: list = []  # (iter, device loss) — fetched once per eval window
    t0 = time.time()
    val_loss = float("nan")
    for it in range(start_it, args.n_examples, args.batch_size):
        if device_data is not None:
            sel = jnp.asarray(next(idx_stream), jnp.int32)
            params, opt_state, loss, key = train_step_gather(
                params, opt_state, device_data, sel, key)
        else:
            batch = tuple(shard_batch(jnp.asarray(b), mesh) for b in next(batches))
            params, opt_state, loss, key = train_step(params, opt_state, batch, key)
        # keep the loss ON DEVICE: a float() here would synchronise every
        # step, and on the tunneled runtime the ~25 ms round-trip dominates
        # the 13 ms step (measured 692 -> 2453 ex/s pipelined)
        pending.append((it, loss))

        if it % args.eval_every == 0:
            losses = [float(l) for _, l in pending]  # one sync per window
            for (step_i, _), v in zip(pending, losses):
                writer.scalar(f"Loss/{args.loss}", v, step_i)
            pending = []
            vl, n = 0.0, 0
            for vbatch in val_ds.batches(args.batch_size, shuffle=False, loop=False):
                vl += float(eval_step(params, tuple(jnp.asarray(b) for b in vbatch), key))
                n += 1
                if n * args.batch_size >= len(val_ds):
                    break
            val_loss = vl / max(n, 1)
            writer.scalar("Loss/val", val_loss, it)
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

        if it % args.ckpt_every == 0:
            ckpt_mgr.save(it, args=ocp.args.StandardSave({"params": params, "step": it}))

    for step_i, l in pending:  # drain the last logging window
        writer.scalar(f"Loss/{args.loss}", float(l), step_i)
    ckpt_mgr.save(args.n_examples, args=ocp.args.StandardSave({"params": params, "step": args.n_examples}))
    ckpt_mgr.wait_until_finished()
    print(f"done: val_loss {val_loss:.4f}, checkpoints in {log_dir}/ckpt")
    return log_dir, val_loss


if __name__ == "__main__":
    main()

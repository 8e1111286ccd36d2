"""Benchmark: 1024px StyleGAN2 audio-reactive render throughput (frames/sec/chip).

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.
Baseline: 30 fps/chip at 1024px on v5e (BASELINE.md).  Also measures the
59-dim audio-feature extraction realtime factor (reported on stderr for
context; target >= 100x).
"""
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


# v5e HBM is 16 GiB with ~15.75e9 usable; leave headroom for the runtime's
# own buffers so the probe's verdict holds across libtpu builds (the 2026-08
# build shrank usable HBM enough to flip B=64 from fitting to OOM)
HBM_BUDGET_BYTES = 15.0e9


def _program_bytes(mem) -> int:
    """Total HBM a compiled program needs: resident arguments + outputs +
    transient temp + code (CompiledMemoryStats)."""
    return int(mem.argument_size_in_bytes + mem.output_size_in_bytes
               + mem.temp_size_in_bytes + mem.generated_code_size_in_bytes
               - mem.alias_size_in_bytes)


def bench_render(resolution=1024, batch_size=None, iters=16):
    # batch sweep on v5e (2026-08-16): B=32 -> 202-209 fps, B=64 -> 217 fps,
    # B=128 fails to compile (HBM); 64 is the knee.  Noise pyramids are
    # bf16: halves their HBM reads, 220 -> 240 fps measured (noise is
    # random texture; precision there is imperceptible).
    #
    # Measures the PRODUCTION render step (synthesis -> device-side uint8,
    # gan/render.py:48-87) with its real double-buffered dispatch: the
    # tunneled axon runtime has a ~54 ms submit->sync round trip, and the
    # render loop hides it by keeping one batch in flight, so a per-iteration
    # sync would charge pure tunnel latency to the chip.  The sync scalar is
    # computed inside the step so fetching it never enqueues extra work.
    # Weight-derived kernels are precomputed once via prepare_synthesis
    # (per-checkpoint work; ~90 ms/step when done per-call).
    from ssar_tpu.gan import stylegan2 as sg

    cfg = sg.StyleGAN2Config(resolution=resolution)
    params = sg.init_generator(jax.random.PRNGKey(0), cfg)
    prep = jax.jit(lambda p: sg.prepare_synthesis(p, cfg, jnp.bfloat16))(params)

    def step_fn(p, pre, l, n):
        frames = (sg.synthesis(p, l, n, cfg, dtype=jnp.bfloat16, prep=pre) + 1.0) / 2.0
        u8 = (jnp.clip(frames, 0.0, 1.0) * 255.0 + 0.5).astype(jnp.uint8)
        return u8[0, 0, 0, 0]

    def build_inputs(bs):
        latents = jax.random.normal(jax.random.PRNGKey(1), (bs, cfg.n_latent, 512))
        noises = [jax.random.normal(jax.random.PRNGKey(i), (bs, h, w, 1), jnp.bfloat16)
                  for i, (h, w) in enumerate(cfg.noise_shapes())]
        return latents, noises

    # pick the batch by COMPILE-TIME memory probe (lower().compile()
    # .memory_analysis()), not by catching runtime OOMs.  On this runtime an
    # over-HBM program fails DURING compile with an opaque HTTP 500 (the OOM
    # detail only reaches the terminal log), and a cold 1024px compile costs
    # many minutes — so never compile a doomed candidate: compile a
    # known-safe base batch, then step UP only if a linear HBM model
    # (fixed code/weights + per-frame activations) predicts the larger
    # program fits the budget.
    def compile_at(bs):
        io = build_inputs(bs)
        exe = jax.jit(step_fn).lower(params, prep, *io).compile()
        return exe, exe.memory_analysis(), io

    def input_bytes(bs):
        return int(bs * (cfg.n_latent * 512 * 4
                         + sum(2 * h * w for h, w in cfg.noise_shapes())))

    if batch_size is not None:
        compiled, mem, (latents, noises) = compile_at(batch_size)
        print(f"batch {batch_size}: program {_program_bytes(mem)/1e9:.2f} GB "
              f"(temp {mem.temp_size_in_bytes/1e9:.2f} GB)", file=sys.stderr)
    else:
        batch_size = 48  # fits every libtpu build observed (r1-r3)
        compiled, mem, (latents, noises) = compile_at(batch_size)
        base_need = _program_bytes(mem)
        print(f"batch {batch_size}: program {base_need/1e9:.2f} GB "
              f"(temp {mem.temp_size_in_bytes/1e9:.2f} GB)", file=sys.stderr)
        for bs in (64,):
            need = (base_need - input_bytes(batch_size) - mem.temp_size_in_bytes
                    + input_bytes(bs) + mem.temp_size_in_bytes * bs / batch_size)
            if need > HBM_BUDGET_BYTES:
                print(f"batch {bs}: predicted {need/1e9:.2f} GB > "
                      f"{HBM_BUDGET_BYTES/1e9:.2f} GB budget, staying at {batch_size}",
                      file=sys.stderr)
                continue
            try:
                exe2, mem2, io2 = compile_at(bs)
            except Exception as e:  # noqa: BLE001 - compile-time OOM is opaque here
                print(f"batch {bs}: compile failed ({str(e)[:120]}), staying at {batch_size}",
                      file=sys.stderr)
                continue
            compiled, mem, (latents, noises), batch_size = exe2, mem2, io2, bs
            print(f"batch {bs}: program {_program_bytes(mem)/1e9:.2f} GB, using it",
                  file=sys.stderr)

    step = lambda: compiled(params, prep, latents, noises)  # noqa: E731

    np.asarray(step())  # warm (block_until_ready does not sync on the
    # tunneled runtime; fetching a value does)

    t0 = time.time()
    pending = step()
    for _ in range(iters - 1):
        nxt = step()
        np.asarray(pending)  # blocks on the previous batch only
        pending = nxt
    np.asarray(pending)
    dt = (time.time() - t0) / iters
    fps = batch_size / dt

    # roofline statement: measured fps -> TFLOP/s -> fraction of v5e bf16
    # peak (197 TFLOP/s), with XLA's own flop count for the program
    try:
        cost = compiled.cost_analysis()
        cost = cost[0] if isinstance(cost, (list, tuple)) else cost
        flops = float(cost.get("flops", 0.0))
        if flops > 0:
            tflops = flops / dt / 1e12
            print(f"roofline: {flops/batch_size/1e9:.1f} GFLOP/frame x {fps:.0f} fps = "
                  f"{tflops:.1f} TFLOP/s = {100*tflops/197:.0f}% of v5e bf16 peak",
                  file=sys.stderr)
    except Exception as e:
        print(f"cost analysis unavailable: {e}", file=sys.stderr)
    return fps


def bench_features(seconds=40, fps=24, iters=10):
    # 40 s = the reference's own track budget (ssar/optimize.py:266 trims
    # to 40 s); short clips under-report because the ~50 ms fixed dispatch
    # cost of the tunneled runtime dominates.
    from ssar_tpu.audio.features import audio2features

    sr = 1024 * fps
    t = np.arange(sr * seconds) / sr
    audio = (0.4 * np.sin(2 * np.pi * 440 * t)
             + 0.1 * np.random.RandomState(0).randn(len(t))).astype(np.float32)
    aj = jnp.asarray(audio)
    F = audio2features(aj, sr, fps)
    np.asarray(F[0, 0])  # true sync (see bench_render)
    t0 = time.time()
    for _ in range(iters):
        F = audio2features(aj, sr, fps)
    np.asarray(F[0, 0])  # one sync after the async dispatch queue: charges
    # a single ~50 ms tunnel round trip instead of one per iteration
    return seconds / ((time.time() - t0) / iters)


def bench_longform(seconds=180, fps=24, resolution=1024, batch_size=64, out="/tmp/longform.mp4"):
    """End-to-end long-form pipeline on one chip (reference behaviour:
    ssar/test.py:341-391 generate_longform_vids): 3-minute track ->
    audio2features -> GRU LatentNoiseReactor over the FULL track ->
    chunked 1024px render -> mp4.  Returns per-stage seconds + e2e fps."""
    from ssar_tpu.gan.render import render_latents_to_video
    from ssar_tpu.gan.wrapper import StyleGAN2Synthesizer
    from ssar_tpu.generate.audio2video import _duplicate_pyramid
    from ssar_tpu.models.reactor import LatentNoiseReactor

    sr = 1024 * fps
    t = np.arange(sr * seconds) / sr
    rng = np.random.RandomState(0)
    audio = (0.4 * np.sin(2 * np.pi * 220 * t * (1 + 0.05 * np.sin(2 * np.pi * t / 7)))
             + 0.1 * rng.randn(len(t))).astype(np.float32)
    audio[:: sr // 2] += 1.0

    # fixed-chunk two-pass long-form path: one compile per chunk size,
    # reused for any track length (the fused whole-track program would
    # re-specialise per length and stall the remote compiler at T ~ 4000)
    from ssar_tpu.parallel.features_sp import audio2features_long

    t0 = time.time()
    F = audio2features_long(jnp.asarray(audio), sr, fps)
    np.asarray(F[0, 0])
    t_feat = time.time() - t0

    T = F.shape[0]
    palette = jax.random.normal(jax.random.PRNGKey(0), (96, 18, 512))
    model = LatentNoiseReactor(jnp.mean(F, 0), jnp.std(F, 0) + 1e-6, palette,
                               backbone="gru", hidden_size=32, num_layers=4)
    params = model.init({"params": jax.random.PRNGKey(1), "noise": jax.random.PRNGKey(2)},
                        F[None, :16])
    t0 = time.time()
    apply = jax.jit(lambda p, f, k: model.apply(p, f, rngs={"noise": k}))
    latents, noise = apply(params, F[None], jax.random.PRNGKey(3))
    np.asarray(latents[0, 0, 0, 0])
    t_model = time.time() - t0

    synthesizer = StyleGAN2Synthesizer(model_file=None, output_size=(resolution, resolution),
                                       strategy="stretch", layer=0)
    noise_nchw = [np.asarray(n[0])[:, None] for n in noise]
    dup = _duplicate_pyramid(noise_nchw)[: synthesizer.n_noises_used]
    t0 = time.time()
    render_latents_to_video(synthesizer, latents[0], dup, out, fps=fps,
                            output_size=(resolution, resolution), batch_size=batch_size)
    t_render = time.time() - t0

    total = t_feat + t_model + t_render
    return {
        "frames": int(T), "feat_s": round(t_feat, 2), "model_s": round(t_model, 2),
        "render_s": round(t_render, 2), "e2e_fps": round(T / total, 2),
        "x_realtime": round(seconds / total, 2),
    }


def main():
    if "--longform" in sys.argv:
        stats = bench_longform()
        print(json.dumps({
            "metric": "longform_180s_1024px_end_to_end_fps",
            "value": stats["e2e_fps"],
            "unit": "frames/sec",
            "vs_baseline": round(stats["e2e_fps"] / 30.0, 3),
            **stats,
        }), flush=True)
        return
    render_fps = bench_render()
    # headline line first — the feature bench may pay a long remote compile
    # on a cold cache and must not block the driver's metric capture
    print(json.dumps({
        "metric": "stylegan2_1024px_render_fps_per_chip",
        "value": round(render_fps, 2),
        "unit": "frames/sec",
        "vs_baseline": round(render_fps / 30.0, 3),
    }), flush=True)
    try:
        rtf = bench_features()
        print(f"audio feature extraction: {rtf:.0f}x realtime", file=sys.stderr)
    except Exception as e:
        print(f"feature bench failed: {e}", file=sys.stderr)


if __name__ == "__main__":
    main()

import os
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import numpy as np, time
from ssar_tpu.gan.stylegan2 import StyleGAN2Config
from ssar_tpu.generate.sample import generate
def log(m): print(f"[{time.strftime('%H:%M:%S')}] {m}", flush=True)
fps, secs = 8, 2
sr = int(1024 * fps)
t = np.arange(sr * secs) / sr
rng = np.random.RandomState(0)
audio = (0.4 * np.sin(2 * np.pi * 220 * t) + 0.05 * rng.randn(len(t))).astype(np.float32)
audio[:: sr // 2] += 0.8
for seed in (42, 3, 7, 11):
    try:
        out = generate(seed=seed, fps=fps, downscale_factor=4, batch_size=4,
                       out_dir="/tmp/ds4", config=StyleGAN2Config(resolution=64),
                       audio=audio, sr=sr)
        log(f"{seed} OK {out}")
    except Exception as e:
        log(f"{seed} FAIL {type(e).__name__} {str(e)[:160]}")

import time
import numpy as np
def log(m): print(f"[{time.strftime('%H:%M:%S')}] {m}", flush=True)
from ssar_tpu.generate.sample import generate

fps, secs = 24, 30
sr = 1024 * fps
t = np.arange(sr * secs) / sr
rng = np.random.RandomState(0)
audio = (0.4 * np.sin(2 * np.pi * 220 * t * (1 + 0.04 * np.sin(2 * np.pi * t / 5)))
         + 0.08 * rng.randn(len(t))).astype(np.float32)
audio[:: sr // 2] += 0.9
t0 = time.time()
out = generate(seed=42, fps=fps, out_dir="/tmp/sample_e2e", audio=audio, sr=sr, batch_size=64)
log(f"generate 30s@1024px: {time.time()-t0:.1f}s -> {out}")

import time, numpy as np, jax, jax.numpy as jnp
from ssar_tpu.models.hippo import init_leg_s, encode_leg_s, encode_leg_s_parallel
for N, T in [(64, 4096), (128, 4096), (128, 16384)]:
    A, B, _ = init_leg_s(N, max_length=T)
    f = jnp.asarray(np.random.RandomState(0).randn(T, 4).astype(np.float32))
    seq = jax.jit(encode_leg_s); par = jax.jit(encode_leg_s_parallel)
    seq(f, A, B).block_until_ready(); par(f, A, B).block_until_ready()
    t0=time.time(); [seq(f, A, B).block_until_ready() for _ in range(3)]; ts=(time.time()-t0)/3
    t0=time.time(); [par(f, A, B).block_until_ready() for _ in range(3)]; tp=(time.time()-t0)/3
    print(f"N={N} T={T}: seq {ts*1e3:.1f}ms  par {tp*1e3:.1f}ms  speedup {ts/tp:.2f}x")

# large-n on-TPU verification + throughput across all reference sizes
import time, jax, jax.numpy as jnp, numpy as np
from agilex_ntt_tpu.params import make_params, find_primes
from agilex_ntt_tpu import golden as G
from agilex_ntt_tpu.ops import ntt_kernel as K

for n in [1024, 8192, 16384, 32768]:
    pp = make_params(n, find_primes(n, 1)[0])
    B = max(512, 2**25 // n)   # ~128MB working set
    key = jax.random.PRNGKey(0)
    x = jax.random.randint(key, (B, n), 0, pp.q, dtype=jnp.uint32)
    xs = np.asarray(jax.device_get(x[:2]))
    want = jnp.asarray(G.fwd_ntt_u32(xs, pp))
    got = K.fwd_ntt(x[:8], pp)[:2]
    ok = bool(jnp.array_equal(got, want))
    def run(iters):
        y = x
        for _ in range(iters):
            y = K.fwd_ntt(y, pp)
        return int(jnp.sum(y[0]) % jnp.uint32(97))
    run(1)
    t1 = time.perf_counter(); run(1); t1 = time.perf_counter() - t1
    t2 = time.perf_counter(); run(21); t2 = time.perf_counter() - t2
    dt = (t2 - t1) / 20
    print(f"n={n:6d} B={B:5d} bitexact={ok}  {dt*1e3:8.3f} ms/call -> {B/dt/1e6:7.3f} M NTT/s "
          f"({B*n/dt/1e9:6.1f} Gcoef/s)", flush=True)

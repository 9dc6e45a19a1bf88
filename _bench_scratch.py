import time, jax, jax.numpy as jnp, numpy as np, sys
from agilex_ntt_tpu.params import make_params, find_primes
from agilex_ntt_tpu import golden as G
from agilex_ntt_tpu.ops import ntt_kernel as K

n = 4096
pp = make_params(n, find_primes(n, 1)[0])
B = 8192
key = jax.random.PRNGKey(0)
x = jax.random.randint(key, (B, n), 0, pp.q, dtype=jnp.uint32)

# correctness spot-check on device (avoid big d2h): compare vs golden of a slice
xs = np.asarray(jax.device_get(x[:4]))
want = jnp.asarray(G.fwd_ntt_u32(xs, pp))
got = K.fwd_ntt(x[:8], pp)[:4]
print("bitexact on TPU:", bool(jnp.array_equal(got, want)), flush=True)

def run(iters, br, f):
    y = x
    for _ in range(iters):
        y = f(y, pp, block_rows=br)
    return int(jnp.sum(y[0]) % jnp.uint32(97))

for name, f in [("fwd", K.fwd_ntt), ("inv", K.inv_ntt)]:
    for br in [8, 64, 256]:
        run(1, br, f)
        t1 = time.perf_counter(); run(1, br, f); t1 = time.perf_counter() - t1
        t2 = time.perf_counter(); run(41, br, f); t2 = time.perf_counter() - t2
        dt = (t2 - t1) / 40
        print(f"{name} block_rows={br:4d}: {dt*1e3:8.3f} ms/call -> {B/dt/1e6:8.3f} M NTT/s", flush=True)

import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
from bez_isaacgym_tpu.solvers.riccati import parallel_backward, sequential_backward
T, n, m = 4, 3, 2
ks = jax.random.split(jax.random.PRNGKey(0), 4)
A = 0.9 * jax.random.orthogonal(ks[0], n, shape=(T,))
B = jax.random.normal(ks[1], (T, n, m)) / jnp.sqrt(n)
cx = jax.random.normal(ks[2], (T, n))
cu = jax.random.normal(ks[3], (T, m))
reg = 1e-1
seq = jax.jit(lambda: sequential_backward(A, B, cx, cu, reg))()
par = jax.jit(lambda: parallel_backward(A, B, cx, cu, reg))()
print("seq k", np.asarray(seq.k).round(4).tolist())
print("par k", np.asarray(par.k).round(4).tolist())
print("seq K[0]", np.asarray(seq.K[0]).round(4).tolist())
print("par K[0]", np.asarray(par.K[0]).round(4).tolist())

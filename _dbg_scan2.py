import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
A = jax.random.normal(jax.random.PRNGKey(0), (4, 3, 3))
for name, fn in (("xy", lambda x, y: x @ y), ("yx", lambda x, y: y @ x)):
    out = jax.jit(lambda A: jax.lax.associative_scan(jax.vmap(fn), A, reverse=True))(A)
    ref0 = A[0] @ A[1] @ A[2] @ A[3]
    alt0 = A[3] @ A[2] @ A[1] @ A[0]
    print(name, "fwd:", np.allclose(out[0], ref0, atol=1e-5), "rev:", np.allclose(out[0], alt0, atol=1e-5))
    # also check last element unchanged
    print(name, "last==A3:", np.allclose(out[3], A[3], atol=1e-6))

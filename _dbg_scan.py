import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
A = jax.random.normal(jax.random.PRNGKey(0), (4, 3, 3))
out = jax.jit(lambda A: jax.lax.associative_scan(
    jax.vmap(lambda x, y: x @ y), A, reverse=True))(A)
ref0 = A[0] @ A[1] @ A[2] @ A[3]
alt0 = A[3] @ A[2] @ A[1] @ A[0]
print("match fwd-order:", np.allclose(np.asarray(out[0]), np.asarray(ref0), atol=1e-5))
print("match rev-order:", np.allclose(np.asarray(out[0]), np.asarray(alt0), atol=1e-5))

import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
A = jax.random.normal(jax.random.PRNGKey(0), (4, 3, 3))
out = jax.jit(lambda A: jax.lax.associative_scan(jax.vmap(lambda x, y: x @ y), A, reverse=True))(A)
print("out2==A2A3:", np.allclose(out[2], A[2] @ A[3], atol=1e-5),
      "out2==A3A2:", np.allclose(out[2], A[3] @ A[2], atol=1e-5))
o0 = np.asarray(out[0])
cands = {"A0A1A2A3": A[0]@A[1]@A[2]@A[3], "A3A2A1A0": A[3]@A[2]@A[1]@A[0],
         "A1A2A3_then_A0_right": (A[1]@A[2]@A[3])@A[0]}
for k, v in cands.items():
    print(k, np.allclose(o0, np.asarray(v), atol=1e-4))
print("max diffs:", {k: float(np.abs(o0-np.asarray(v)).max()) for k,v in cands.items()})

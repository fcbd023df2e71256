import sys; sys.path.insert(0, ".")
import jax, jax.numpy as jnp, numpy as np
import flash_cosine_sim_attention_tpu as fcsa
assert jax.default_backend() == "tpu", jax.default_backend()
rng = np.random.default_rng(0)
t = lambda *s: jnp.asarray(rng.standard_normal(s), jnp.bfloat16)
q, k, v = t(4,8,1024,64), t(4,8,1024,64), t(4,8,1024,64)
val, grads = jax.value_and_grad(
    lambda q,k,v: jnp.mean(fcsa.flash_cosine_sim_attention(
        q,k,v,causal=True).astype(jnp.float32)**2), argnums=(0,1,2))(q,k,v)
print("sanity:", val,
      [bool(jnp.isfinite(g.astype(jnp.float32)).all()) for g in grads])
qf,kf,vf = (x.astype(jnp.float32) for x in (q[:1],k[:1],v[:1]))
print("parity:", float(jnp.abs(
    fcsa.flash_cosine_sim_attention(qf,kf,vf,causal=True) -
    fcsa.plain_cosine_sim_attention(qf,kf,vf,causal=True)).max()))

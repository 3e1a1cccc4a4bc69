"""TPU compiled check + chained timing of the Pallas CSPN adjoint."""
import sys, os, time, json
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from cspn_monodepth_tpu.ops.cspn_ref import cspn_propagate_ref
from cspn_monodepth_tpu.ops.cspn_pallas import cspn_propagate_pallas

assert jax.default_backend() != "cpu"
rng = np.random.default_rng(0)
b, h, w, T = 32, 228, 304, 24
guid = jnp.asarray(rng.normal(size=(b, h, w, 8)).astype(np.float32))
blur = jnp.asarray(rng.uniform(0.5, 9.5, (b, h, w)).astype(np.float32))
sp = jnp.asarray(blur * (rng.random((b, h, w)) < 0.01))
cot = jnp.asarray(rng.normal(size=(b, h, w)).astype(np.float32))

def gp(g, d, s):
    return jax.grad(lambda gg, dd, ss: jnp.vdot(
        cspn_propagate_pallas(gg, dd, ss, num_iters=T, norm_type="8sum_clamp"), cot),
        (0, 1, 2))(g, d, s)

def gr(g, d, s):
    return jax.grad(lambda gg, dd, ss: jnp.vdot(
        cspn_propagate_ref(gg, dd, ss, num_iters=T, norm_type="8sum_clamp"), cot),
        (0, 1, 2))(g, d, s)

a = jax.jit(gp)(guid, blur, sp)
bb = jax.jit(gr)(guid, blur, sp)
for i, (x, y) in enumerate(zip(a, bb)):
    s = max(1.0, float(jnp.abs(y).max()))
    err = float(jnp.abs(x - y).max()) / s
    print(f"grad[{i}] maxrel {err:.2e}")
    assert err < 2e-4, (i, err)

def chain(fn, n=10):
    @jax.jit
    def chained(d):
        def body(d, _):
            dg, dd, ds = fn(guid, d, sp)
            return d + dd * 1e-12, None
        d, _ = jax.lax.scan(body, d, None, length=n)
        return d
    out = chained(blur); _ = float(jnp.sum(out[..., :1]))
    t0 = time.perf_counter(); out = chained(blur); _ = float(jnp.sum(out[..., :1]))
    return (time.perf_counter() - t0) / n * 1e3

t_pallas = chain(gp)
t_jnp = chain(gr)
print(json.dumps({"pallas_fwdbwd_ms": round(t_pallas, 3),
                  "jnp_fwdbwd_ms": round(t_jnp, 3),
                  "speedup": round(t_jnp / t_pallas, 2),
                  "shape": f"{b}x{h}x{w}", "iters": T}))

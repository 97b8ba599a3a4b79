"""Measure the Mosaic per-grid-step machinery cost that motivates the
Tc-blocked packed kernels (ops/pallas_stream.make_streamk_packed_propagate).

Three kernels with grid=(1221,): (a) a minimal carried-state body, (b) + a
per-step history store, (c) + the packed kernel's full per-step math
(8-slot plane contraction + three 3-dot bf16-pair matvecs). Each variant is
scanned 64x inside ONE jit with a single synchronous fetch (block_until_ready
is unreliable through the relay). Measured on the v5e (2026-08-19):

    minimal carried body      : 0.363 us/step
    + hist write              : 0.361 us/step
    + contraction + 3x(3 dots): 0.335 us/step

i.e. the step math hides ENTIRELY under ~0.36 us/grid-step of machinery —
the packed kernels amortize it by advancing Tc sub-steps per grid step."""
import sys, time
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

P, Bp, Ke, nsteps = 128, 8, 8, 1221
vmem = {"memory_space": pltpu.VMEM}
cp = {"compiler_params": pltpu.CompilerParams(dimension_semantics=("arbitrary",))}

REPS = 64

def timeit(f, args, label, n=3):
    # scan the kernel REPS times inside ONE jit; one synchronous fetch
    def many(*a):
        def body(c, _):
            r = f(*a)
            x = r[0] if isinstance(r, tuple) else r
            return c + jnp.sum(x), None
        out, _ = jax.lax.scan(body, jnp.zeros(()), None, length=REPS)
        return out
    fm = jax.jit(many)
    _ = float(fm(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        _ = float(fm(*args))
    dt = (time.perf_counter() - t0) / n / REPS
    print(f"{label}: {dt*1e6/nsteps:.3f} us/step  ({dt*1000:.3f} ms/kernel)", flush=True)

# (a) minimal: carried state += small read from a streamed row
def body_min(c_ref, x0_ref, x_ref):
    i = pl.program_id(0)
    @pl.when(i == 0)
    def _():
        x_ref[:] = x0_ref[:]
    x_ref[:] = x_ref[:] + c_ref[0, 0:1]

full = pl.BlockSpec((Bp, P), lambda i: (0, 0), **vmem)
crow = pl.BlockSpec((1, Ke, P), lambda i: (i, 0, 0), **vmem)
fmin = jax.jit(lambda C, x0: pl.pallas_call(
    body_min, grid=(nsteps,),
    out_shape=jax.ShapeDtypeStruct((Bp, P), jnp.float32),
    in_specs=[crow, full], out_specs=full, **cp)(C, x0))

C = jnp.ones((nsteps, Ke, P), jnp.float32) * 1e-6
x0 = jnp.ones((Bp, P), jnp.float32)
timeit(fmin, (C, x0), "minimal carried body      ")

# (b) + hist write per step
hist_spec = pl.BlockSpec((1, Bp, P), lambda i: (i, 0, 0), **vmem)
def body_hist(c_ref, x0_ref, x_ref, h_ref):
    i = pl.program_id(0)
    @pl.when(i == 0)
    def _():
        x_ref[:] = x0_ref[:]
    x_ref[:] = x_ref[:] + c_ref[0, 0:1]
    h_ref[0] = x_ref[:]
fh = jax.jit(lambda C, x0: pl.pallas_call(
    body_hist, grid=(nsteps,),
    out_shape=(jax.ShapeDtypeStruct((Bp, P), jnp.float32),
               jax.ShapeDtypeStruct((nsteps, Bp, P), jnp.float32)),
    in_specs=[crow, full], out_specs=(full, hist_spec), **cp)(C, x0))
timeit(fh, (C, x0), "+ hist write              ")

# (c) + contraction (Ke fma over (P,P)) + 4 bf16-pair dots x3 (iters-ish)
const3 = pl.BlockSpec((Ke, P, P), lambda i: (0, 0, 0), **vmem)
def body_work(S_ref, c_ref, x0_ref, x_ref, h_ref):
    i = pl.program_id(0)
    @pl.when(i == 0)
    def _():
        x_ref[:] = x0_ref[:]
    H = c_ref[0, 0:1] * S_ref[0]
    for k in range(1, Ke):
        H = H + c_ref[0, k:k+1] * S_ref[k]
    x = x_ref[:]
    hh = H.astype(jnp.bfloat16)
    hl = (H - hh.astype(jnp.float32)).astype(jnp.bfloat16)
    for _r in range(3):
        xh = x.astype(jnp.bfloat16)
        xl = (x - xh.astype(jnp.float32)).astype(jnp.bfloat16)
        d = jnp.dot(xh, hh, preferred_element_type=jnp.float32)
        d = d + jnp.dot(xh, hl, preferred_element_type=jnp.float32) \
              + jnp.dot(xl, hh, preferred_element_type=jnp.float32)
        x = x + 1e-6 * d
    x_ref[:] = x
    h_ref[0] = x
S = jnp.ones((Ke, P, P), jnp.float32) * 0.01
fw = jax.jit(lambda S, C, x0: pl.pallas_call(
    body_work, grid=(nsteps,),
    out_shape=(jax.ShapeDtypeStruct((Bp, P), jnp.float32),
               jax.ShapeDtypeStruct((nsteps, Bp, P), jnp.float32)),
    in_specs=[const3, crow, full], out_specs=(full, hist_spec), **cp)(S, C, x0))
timeit(fw, (S, C, x0), "+ contraction + 3x(3 dots)")

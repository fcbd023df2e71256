"""Standalone dQ-kernel variants to locate the backward bottleneck.

Self-contained pallas kernels (copies of the transposed dQ structure with
pieces removed) timed on the real TPU.  NOT part of the package — a
measurement scratchpad.
"""

import functools
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from flash_cosine_sim_attention_tpu.utils.benchmark import _slope_ms

LOG2E = 1.4426950408889634


def make_dq(variant, bq=512, bko=4096, bki=512, causal=True, n=4096, d=64,
            b=4, h=8):
    def kernel(qT_ref, k_ref, v_ref, doT_ref, deltaT_ref, dqT_ref, dq_acc,
               *, scale=8.0):
        qi = pl.program_id(2)
        ki = pl.program_id(3)
        nk = pl.num_programs(3)

        @pl.when(ki == 0)
        def _init():
            dq_acc[...] = jnp.zeros_like(dq_acc)

        q_last = qi * bq + bq - 1
        run = (q_last >= ki * bko) if causal else True

        @pl.when(run)
        def _tile():
            c = scale * LOG2E
            qT = (qT_ref[0, 0].astype(jnp.float32) * c).astype(qT_ref.dtype)
            doT = doT_ref[0, 0]
            delta = deltaT_ref[0, 0]
            row = qi * bq + jax.lax.broadcasted_iota(
                jnp.int32, (bki, bq), 1)

            for j in range(bko // bki):
                col0 = ki * bko + j * bki

                def _sub(masked, j=j, col0=col0):
                    kj = k_ref[0, 0, j * bki:(j + 1) * bki]
                    vj = v_ref[0, 0, j * bki:(j + 1) * bki]
                    sT = jax.lax.dot_general(
                        kj, qT, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    if variant == "no_dpT":
                        dpT = delta
                    else:
                        dpT = jax.lax.dot_general(
                            vj, doT, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
                    if variant == "no_exp":
                        ds = sT * (dpT - delta)
                    else:
                        ds = jnp.exp2(sT) * (dpT - delta)
                    if masked:
                        col_s = col0 + jax.lax.broadcasted_iota(
                            jnp.int32, (bki, bq), 0)
                        ds = jnp.where(col_s <= row, ds, 0.0)
                    if variant == "no_dq":
                        dq_acc[...] += ds[:d].astype(jnp.float32)
                    else:
                        dq_acc[...] += jax.lax.dot_general(
                            kj, ds.astype(kj.dtype), (((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)

                if causal:
                    sub_interior = col0 + bki - 1 <= qi * bq
                    sub_visible = q_last >= col0
                    pl.when(sub_visible & jnp.logical_not(sub_interior))(
                        lambda: _sub(True))
                    pl.when(sub_interior)(lambda: _sub(False))
                else:
                    _sub(False)

        @pl.when(ki == nk - 1)
        def _finalize():
            dqT_ref[0, 0] = (dq_acc[...] * scale).astype(dqT_ref.dtype)

    nq, nk = n // bq, n // bko

    def call(qT, k, v, doT, deltaT):
        return pl.pallas_call(
            functools.partial(kernel),
            grid=(b, h, nq, nk),
            in_specs=[
                pl.BlockSpec((1, 1, d, bq),
                             lambda bi, hi, qi, ki: (bi, hi, 0, qi)),
                pl.BlockSpec((1, 1, bko, d),
                             lambda bi, hi, qi, ki: (bi, hi, ki, 0)),
                pl.BlockSpec((1, 1, bko, d),
                             lambda bi, hi, qi, ki: (bi, hi, ki, 0)),
                pl.BlockSpec((1, 1, d, bq),
                             lambda bi, hi, qi, ki: (bi, hi, 0, qi)),
                pl.BlockSpec((1, 1, 1, bq),
                             lambda bi, hi, qi, ki: (bi, hi, 0, qi)),
            ],
            out_specs=pl.BlockSpec(
                (1, 1, d, bq), lambda bi, hi, qi, ki: (bi, hi, 0, qi)),
            out_shape=jax.ShapeDtypeStruct((b, h, d, n), jnp.bfloat16),
            scratch_shapes=[pltpu.VMEM((d, bq), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "parallel",
                                     "arbitrary")),
        )(qT, k, v, doT, deltaT)

    return call


def main():
    b, h, n, d = 4, 8, 4096, 64
    rng = np.random.default_rng(0)
    qT = jnp.asarray(rng.standard_normal((b, h, d, n)), jnp.bfloat16)
    doT = jnp.asarray(rng.standard_normal((b, h, d, n)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.bfloat16)
    deltaT = jnp.asarray(rng.standard_normal((b, h, 1, n)), jnp.float32)

    variants = sys.argv[1:] or ["full", "no_exp", "no_dpT", "no_dq"]
    configs = []
    for v_ in variants:
        if ":" in v_:
            name, bks = v_.split(":")
            bq_, bko_, bki_ = (int(x) for x in bks.split(","))
            configs.append((name, dict(bq=bq_, bko=bko_, bki=bki_)))
        else:
            configs.append((v_, {}))

    for name, kw in configs:
        call = make_dq(name, **kw)

        @jax.jit
        def run(nn, doT, qT, k, v, deltaT):
            def body(i, x):
                return call(qT, k, v, x, deltaT).astype(x.dtype)
            out = jax.lax.fori_loop(0, nn, body, doT)
            return jnp.sum(out.astype(jnp.float32))

        t = _slope_ms(lambda nn: run(nn, doT, qT, k, v, deltaT), 20)
        print(f"{name} {kw or ''}: {t:.3f} ms", flush=True)


if __name__ == "__main__":
    main()

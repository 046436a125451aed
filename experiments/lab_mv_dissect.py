"""Dissect the blocktri matvec kernel: is 220 GB/s DMA-bound or VPU-bound?

Variants:
  stream  — DMA the 3 mats, do NO matvec (write sum of first lanes)
  cat     — ONE concatenated [kt, 3, b, b] DMA per block + 3 VPU matvecs
  vpu     — current kernel (3 DMAs + 3 VPU lane-reduction matvecs)
  mxu     — 3 DMAs + dot_general matvecs
"""
import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def build(n=1_000_000, k=100, b=128, Kc=64, seed=0):
    from spike_petsc_tpu.ops.band import BandedMatrix
    from spike_petsc_tpu.ops.blocktri import band_to_blocktri
    w = 2 * k + 1
    key = jax.random.PRNGKey(seed)
    data = jax.random.uniform(key, (n, w), jnp.float32, minval=-1., maxval=1.)
    data = data.at[:, k].set(jnp.sum(jnp.abs(data), axis=1) + 1.0)
    T = jax.jit(lambda d: band_to_blocktri(
        BandedMatrix(data=d, kl=k, ku=k), b))(data)
    nb = T.nb
    nbk = -(-nb // Kc)
    nbp = Kc * nbk
    pad = nbp - nb
    padb = lambda a: jnp.pad(a, ((0, pad), (0, 0), (0, 0)))
    D = padb(T.D).reshape(Kc, nbk, b, b)
    L = padb(T.L).reshape(Kc, nbk, b, b)
    U = padb(T.U).reshape(Kc, nbk, b, b)
    M = jnp.stack([L, D, U], axis=2)            # [Kc, nbk, 3, b, b]
    x = jnp.ones((nbp + 2, b), jnp.float32)
    xm = x[0:nbp].reshape(Kc, nbk, b)
    xc = x[1:nbp + 1].reshape(Kc, nbk, b)
    xp = x[2:nbp + 2].reshape(Kc, nbk, b)
    return D, L, U, M, xm, xc, xp, nbk, Kc


def make_call(variant, nbk, Kc, kt=8, nbuf=4, b=128):
    hbm = pl.BlockSpec(memory_space=pl.ANY)
    vec = pl.BlockSpec((kt, nbk, b), lambda c: (c, 0, 0),
                       memory_space=pltpu.VMEM)

    def mv(m, v):
        if variant == "mxu":
            return jax.lax.dot_general(
                m, v[:, :, None], (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)[:, :, 0]
        return jnp.sum(m * v[:, None, :], axis=-1)

    if variant == "cat":
        def kern(m_hbm, xm_ref, xc_ref, xp_ref, o_ref, mbuf, msem):
            c = pl.program_id(0)
            part = pl.ds(c * kt, kt)

            def dma(slot, i):
                return pltpu.make_async_copy(m_hbm.at[part, i],
                                             mbuf.at[slot], msem.at[slot])
            for s in range(min(nbuf, nbk)):
                dma(s, s).start()

            def body(i, carry):
                slot = i % nbuf
                dma(slot, i).wait()
                mm = mbuf[slot]
                y = (mv(mm[:, 1], xc_ref[:, i]) + mv(mm[:, 0], xm_ref[:, i])
                     + mv(mm[:, 2], xp_ref[:, i]))

                @pl.when(i + nbuf < nbk)
                def _():
                    dma(slot, i + nbuf).start()
                o_ref[:, i] = y
                return carry
            jax.lax.fori_loop(0, nbk, body, jnp.int32(0), unroll=False)

        return lambda M, xm, xc, xp: pl.pallas_call(
            kern, grid=(Kc // kt,),
            in_specs=[hbm, vec, vec, vec], out_specs=vec,
            out_shape=jax.ShapeDtypeStruct((Kc, nbk, b), jnp.float32),
            scratch_shapes=[pltpu.VMEM((nbuf, kt, 3, b, b), jnp.float32),
                            pltpu.SemaphoreType.DMA((nbuf,))],
        )(M, xm, xc, xp)

    def kern(d_hbm, l_hbm, u_hbm, xm_ref, xc_ref, xp_ref, o_ref,
             dbuf, lbuf, ubuf, dsem, lsem, usem):
        c = pl.program_id(0)
        part = pl.ds(c * kt, kt)

        def dmas(slot, i):
            return (pltpu.make_async_copy(d_hbm.at[part, i], dbuf.at[slot],
                                          dsem.at[slot]),
                    pltpu.make_async_copy(l_hbm.at[part, i], lbuf.at[slot],
                                          lsem.at[slot]),
                    pltpu.make_async_copy(u_hbm.at[part, i], ubuf.at[slot],
                                          usem.at[slot]))
        for s in range(min(nbuf, nbk)):
            for cp in dmas(s, s):
                cp.start()

        def body(i, carry):
            slot = i % nbuf
            for cp in dmas(slot, i):
                cp.wait()
            d, lm, um = dbuf[slot], lbuf[slot], ubuf[slot]
            if variant == "stream":
                y = d[:, :, 0] + lm[:, :, 0] + um[:, :, 0] + xc_ref[:, i]
            else:
                y = (mv(d, xc_ref[:, i]) + mv(lm, xm_ref[:, i])
                     + mv(um, xp_ref[:, i]))

            @pl.when(i + nbuf < nbk)
            def _():
                for cp in dmas(slot, i + nbuf):
                    cp.start()
            o_ref[:, i] = y
            return carry
        jax.lax.fori_loop(0, nbk, body, jnp.int32(0), unroll=False)

    return lambda D, L, U, xm, xc, xp: pl.pallas_call(
        kern, grid=(Kc // kt,),
        in_specs=[hbm, hbm, hbm, vec, vec, vec], out_specs=vec,
        out_shape=jax.ShapeDtypeStruct((Kc, nbk, b), jnp.float32),
        scratch_shapes=[pltpu.VMEM((nbuf, kt, b, b), jnp.float32),
                        pltpu.VMEM((nbuf, kt, b, b), jnp.float32),
                        pltpu.VMEM((nbuf, kt, b, b), jnp.float32),
                        pltpu.SemaphoreType.DMA((nbuf,)),
                        pltpu.SemaphoreType.DMA((nbuf,)),
                        pltpu.SemaphoreType.DMA((nbuf,))],
    )(D, L, U, xm, xc, xp)


def main():
    D, L, U, M, xm, xc, xp, nbk, Kc = build()
    b = 128
    bytes_T = 3 * Kc * nbk * b * b * 4

    @jax.jit
    def _digest(x):
        return x.ravel()[:1024] * 1.0

    def sync(t):
        return np.asarray(_digest(t))

    def timed(fn, rep=5):
        ts = []
        for _ in range(rep):
            t0 = time.perf_counter()
            sync(fn())
            ts.append(time.perf_counter() - t0)
        return min(ts)

    for variant in ("stream", "cat", "vpu", "mxu"):
        call = make_call(variant, nbk, Kc)
        if variant == "cat":
            body = lambda y, a: call(a[0], a[1], y, a[3])
            args = (M, xm, xc, xp)
        else:
            body = lambda y, a: call(a[0], a[1], a[2], a[3], y, a[5])
            args = (D, L, U, xm, xc, xp)

        @partial(jax.jit, static_argnames=("r",))
        def loop(r, *a):
            # feed the output back as the center vector so the kernel call
            # cannot be hoisted out of the loop
            return jax.lax.fori_loop(0, r, lambda i, y: body(y, a), a[-2])
        try:
            timed(lambda: loop(2, *args), rep=1)
            timed(lambda: loop(12, *args), rep=1)
            t = (timed(lambda: loop(12, *args))
                 - timed(lambda: loop(2, *args))) / 10
            print(f"{variant:7s}: {t*1e3:7.3f} ms  {bytes_T/t/1e9:5.0f} GB/s")
        except Exception as e:
            print(f"{variant:7s}: FAILED {type(e).__name__}: {str(e)[:150]}")


if __name__ == "__main__":
    main()

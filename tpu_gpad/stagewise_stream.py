"""HBM-streamed fused stage-wise GPAD kernel (big-state shapes).

The whole-VMEM kernel (``stagewise_kernel``) holds the entire dual/plan
state for a batch tile in VMEM — which caps it at roughly
``2 N m_sp B_t`` fp32 elements, unbuildable exactly where the stage-wise
engine wins biggest (battery n30 N200: the dual state alone is 26 MB per
128-lane tile; STAGEWISE.json rows 5/9 carry null kernel fields). The XLA
scan path that serves those shapes today is LAUNCH-LATENCY bound: 2N scan
steps per iteration at ~7-8 us each against <0.5 us of math.

This kernel keeps the whole solve in ONE kernel invocation per batch tile
and STREAMS the dual state through VMEM with ``pltpu.emit_pipeline``
(double-buffered stage blocks over HBM), so a stage step costs its DMA
(~0.5 us at 128 lanes) instead of a dispatch. What stays resident in
VMEM: the backward slopes ``stilde`` and the averaged plan ``zu``
(O(N (n_p + p_p)) per lane — the small arrays), plus the stage-invariant
constraint maps. What streams: the dual iterates and the packed per-stage
constants (the O(N m_sp) arrays).

Momentum needs (y_i, y_{i-1}) and writes y_{i+1}: the three dual iterates
live in ONE (3, N, m_sp, B_p) HBM workspace cycled by iteration index —
the rotation indices are traced values in the pipeline index maps, so one
traced pipeline serves every iteration (no per-parity program variants).
O'Donoghue-Candes restart rides the same LAZY form as the v1 kernel's fix
loop, but with zero extra passes: a per-lane mask carried across
iterations rewrites ``y_prev_eff = where(mask, y_i, y_{i-1})`` at READ
time (exactly the v1 post-fix semantics, since the fix wrote y_prev <-
y_i wherever the test fired).

Algebra, packing (``pack_stagewise_constants``), scenario-minor layout
and the h-chunk trick are shared with the v1 kernel verbatim — iterate
parity is tested against the XLA path. Reference anchor: the production
MVP-variant role (``kernel_functions.cu:142-200``) — one layout does not
fit all shapes, so the engine carries more than one kernel.

Scope: mode="fixed" (+ restart), cold or warm starts, m_x > 0 and
m_u > 0; runtime q_lin/c and eps mode ride the XLA path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_gpad.stagewise_kernel import (
    LANE,
    SUBLANE,
    _VMEM_BUDGET,
    _dotg,
    _pad_axis,
    _round_up,
    pack_stagewise_constants,
)


def _ensure_tpu_info_for_interpret():
    """``emit_pipeline`` derives its block tiling from the TPU generation,
    which raises off-TPU — pin a v5-class answer for INTERPRET runs (the
    tiling only shapes buffer layouts; interpret-mode results are
    layout-independent)."""
    from jax._src.pallas.mosaic import tpu_info

    try:
        tpu_info.get_tpu_info()
    except Exception:
        class _Fake:
            generation = 5

        tpu_info.get_tpu_info = lambda: _Fake()


def pick_stream_tile(N: int, n_p: int, p_p: int, mx_p: int, mu_p: int,
                     c_pad: int):
    """Largest lane width whose RESIDENT set + pipeline buffers fit VMEM.

    Resident per lane: stilde (N n_p) + zu (N p_p) fp32. Streamed blocks
    are double-buffered by ``emit_pipeline``: bwd reads (y, y_prev, CP,
    CP_next), fwd reads (y, y_prev, CP) and writes y_next, the epilogue
    reads (y, CP)."""
    m_sp = mx_p + mu_p
    np_pp = n_p + p_p
    per_lane = 4 * (N * (n_p + p_p) + 3 * (n_p + p_p + 8) + 4 * SUBLANE)
    # y-block streams: worst pass holds 4 double-buffered m_sp blocks
    stream_lane = 4 * (8 * m_sp)
    cp_bufs = 4 * (4 * np_pp * c_pad)  # CP blocks across specs, 2-buffered
    for b_t in (512, 256, 128):
        if (per_lane + stream_lane) * b_t + cp_bufs <= _VMEM_BUDGET:
            return b_t
    return None


def stagewise_stream_compatible(data) -> tuple:
    """(ok, reason): can this StagewiseData ride the streamed kernel?"""
    if data.m_x == 0 or data.m_u == 0:
        return False, "kernel needs m_x > 0 and m_u > 0 (inert-pad rows)"
    n_p = _round_up(data.n_x, SUBLANE)
    p_p = _round_up(data.n_u, SUBLANE)
    mx_p = _round_up(data.m_x, SUBLANE)
    mu_p = _round_up(data.m_u, SUBLANE)
    np_pp = n_p + p_p
    m_sp = mx_p + mu_p
    c_pad = _round_up(3 * np_pp + -(-m_sp // np_pp) + 3, LANE)
    if pick_stream_tile(data.horizon, n_p, p_p, mx_p, mu_p, c_pad) is None:
        return False, "resident stilde/zu exceed VMEM (horizon too long)"
    return True, ""


def _stream_kernel(
    # scalar prefetch
    theta_ref,
    beta_ref,
    invl_ref,
    # inputs (ANY unless noted)
    y0_hbm,  # (N, m_sp, B_p) start dual (zeros when cold)
    x0_ref,  # (n_p, B_t) VMEM
    CP_hbm,  # (N, np_pp, c_pad) packed per-stage constants
    GT_ref,  # (np_pp, m_sp) VMEM
    G_ref,  # (m_sp, np_pp) VMEM
    # outputs
    Y_hbm,  # (3, N, m_sp, B_p) ANY: dual rotation; [iterations % 3] is y*
    zu_hbm,  # (N, p_p, B_p) ANY
    u0_ref,  # (p_p, B_t) VMEM
    diag_ref,  # (8, B_t) VMEM
    # scratch
    st_ref,  # (N, n_p, B_t) stilde (resident)
    zu_ref,  # (N, p_p, B_t) averaged plan (resident)
    s_ref,  # (n_p, B_t) bwd carry
    ru_ref,  # (p_p, B_t) bwd carry (ru_{k+1})
    x_ref,  # (n_p, B_t) fwd carry
    acc_ref,  # (8, B_t) rows: 0 racc, 1 mask, 2 th_c, 3 th_p, 4 vmax, 5 gap
    sem,  # DMA semaphores (2,)
    *,
    N: int,
    n_p: int,
    p_p: int,
    mx_p: int,
    mu_p: int,
    iterations: int,
    restart: bool,
):
    B_t = x0_ref.shape[-1]
    f32 = jnp.float32
    inv_L = invl_ref[0]
    np_pp = n_p + p_p
    m_sp = mx_p + mu_p
    j = pl.program_id(0)
    lane = pl.ds(j * B_t, B_t)

    # static column offsets into the packed constant block (same layout
    # as the v1 kernel)
    o_R = 0
    o_HB = o_R + np_pp
    o_M = o_HB + np_pp
    o_h = o_M + np_pp
    n_hcols = -(-m_sp // np_pp)
    o_dtl = o_h + n_hcols
    o_qoff = o_dtl + 1
    o_c = o_qoff + 1
    h_chunks = [
        (jj * np_pp, min((jj + 1) * np_pp, m_sp)) for jj in range(n_hcols)
    ]

    GT = GT_ref[...]
    G = G_ref[...]
    x0 = x0_ref[...]

    # stage Y[0] <- y0 for this tile (one 13-MB-class HBM->HBM DMA) and
    # zero the residents
    dma0 = pltpu.make_async_copy(
        y0_hbm.at[:, :, lane], Y_hbm.at[0, :, :, lane], sem.at[0]
    )
    dma0.start()

    def _zero(k, _):
        st_ref[k] = jnp.zeros(st_ref.shape[1:], dtype=f32)
        zu_ref[k] = jnp.zeros(zu_ref.shape[1:], dtype=f32)
        return 0

    jax.lax.fori_loop(0, N, _zero, 0)
    acc_ref[...] = jnp.zeros((8, B_t), dtype=f32)
    acc_ref[2:4, :] = jnp.ones((2, B_t), dtype=f32)  # th_c, th_p
    dma0.wait()

    c_pad = CP_hbm.shape[-1]
    krev = lambda t: N - 1 - t  # bwd pass stage order
    kfwd = lambda t: t

    def y_spec(r, kmap):
        return pl.BlockSpec((1, 1, m_sp, B_t), lambda t: (r, kmap(t), 0, j))

    def cp_spec(kmap):
        return pl.BlockSpec((1, np_pp, c_pad), lambda t: (kmap(t), 0, 0))

    def w_eff(cur, prev, b):
        if restart:
            mask = acc_ref[1:2, :] > 0.5
            prev = jnp.where(mask, cur, prev)
        return cur + b * (cur - prev)

    def run_iteration(i, _):
        if restart:
            th = acc_ref[2:3, :]
            b = th * (1.0 / acc_ref[3:4, :] - 1.0)
        else:
            th = theta_ref[i]
            b = beta_ref[i]
        r_cur = i % 3
        r_prev = jnp.maximum(i - 1, 0) % 3
        r_next = (i + 1) % 3

        # ---- backward sweep (stages N-1..0): st[k] = s_{k+1} ----------
        def bwd_body(cur_ref, prev_ref, cpk_ref, cpk1_ref):
            t = pl.program_id(0)
            k = N - 1 - t
            w = w_eff(cur_ref[0, 0], prev_ref[0, 0], b)
            qr = _dotg(GT, w)
            R_k1 = cpk1_ref[0, :n_p, o_R:o_R + np_pp]
            sru = jnp.concatenate([s_ref[...], ru_ref[...]], axis=0)
            s_new = (
                qr[:n_p]
                + cpk_ref[0, :n_p, o_qoff:o_qoff + 1]
                + _dotg(R_k1, sru)
            )
            st_ref[k] = s_new
            s_ref[...] = s_new
            ru_ref[...] = qr[n_p:]

        # zeroed carries make the t=0 recursion term vanish (R*(0;0)),
        # reproducing the scan's s_{N-1} = qx + qoff base case
        s_ref[...] = jnp.zeros((n_p, B_t), dtype=f32)
        ru_ref[...] = jnp.zeros((p_p, B_t), dtype=f32)
        pltpu.emit_pipeline(
            bwd_body,
            grid=(N,),
            in_specs=[
                y_spec(r_cur, krev),
                y_spec(r_prev, krev),
                cp_spec(krev),
                cp_spec(lambda t: jnp.minimum(krev(t) + 1, N - 1)),
            ],
        )(Y_hbm, Y_hbm, CP_hbm, CP_hbm)

        # ---- forward rollout + dual ascent (stages 0..N-1) ------------
        def fwd_body(cur_ref, prev_ref, cpk_ref, nxt_ref):
            k = pl.program_id(0)
            Ck = cpk_ref[0]
            cur = cur_ref[0, 0]
            w = w_eff(cur, prev_ref[0, 0], b)
            ru_k = _dotg(GT, w)[n_p:]
            st_k = st_ref[k] + Ck[:n_p, o_dtl:o_dtl + 1]
            HB_k = Ck[:p_p, o_HB:o_HB + np_pp]
            M_k = Ck[:np_pp, o_M:o_M + np_pp]
            kff = _dotg(HB_k, jnp.concatenate([st_k, ru_k], axis=0))
            xu = _dotg(M_k, jnp.concatenate([x_ref[...], kff], axis=0))
            x_next = xu[:n_p] + Ck[:n_p, o_c:o_c + 1]
            u = xu[n_p:]
            zu_ref[k] = (1.0 - th) * zu_ref[k] + th * u
            gh = _dotg(G, jnp.concatenate([x_next, u], axis=0))
            racc = acc_ref[0:1, :]
            for lo, hi in h_chunks:
                h_j = Ck[: hi - lo, o_h + (lo // np_pp):o_h
                         + (lo // np_pp) + 1]
                y_new = jnp.maximum(
                    w[lo:hi] + inv_L * (gh[lo:hi] - h_j), 0.0
                )
                if restart:
                    racc = racc + jnp.sum(
                        (w[lo:hi] - y_new) * (y_new - cur[lo:hi]),
                        axis=0,
                        keepdims=True,
                    )
                nxt_ref[0, 0, lo:hi, :] = y_new
            if restart:
                acc_ref[0:1, :] = racc
            x_ref[...] = x_next

        x_ref[...] = x0
        if restart:
            acc_ref[0:1, :] = jnp.zeros((1, B_t), dtype=f32)
        pltpu.emit_pipeline(
            fwd_body,
            grid=(N,),
            in_specs=[
                y_spec(r_cur, kfwd),
                y_spec(r_prev, kfwd),
                cp_spec(kfwd),
            ],
            out_specs=[y_spec(r_next, kfwd)],
        )(Y_hbm, Y_hbm, CP_hbm, Y_hbm)

        if restart:
            fire = acc_ref[0:1, :] > 0.0
            th_c = acc_ref[2:3, :]
            acc_ref[1:2, :] = jnp.where(
                fire, 1.0, 0.0
            )  # lazy y_prev <- y rewrite for the next iteration's reads
            acc_ref[2:3, :] = jnp.where(
                fire, 1.0,
                th_c * (jnp.sqrt(th_c * th_c + 4.0) - th_c) * 0.5,
            )
            acc_ref[3:4, :] = jnp.where(fire, 1.0, th_c)
        return 0

    jax.lax.fori_loop(0, iterations, run_iteration, 0, unroll=False)

    # ---- epilogue: residual/gap on the averaged primal (v1 semantics);
    # final dual lives in Y[iterations % 3] ----------------------------
    r_fin = iterations % 3

    def epi_body(y_ref_blk, cpk_ref):
        k = pl.program_id(0)
        Ck = cpk_ref[0]
        M_k = Ck[:np_pp, o_M:o_M + np_pp]
        u = zu_ref[k]
        Kx = -_dotg(M_k[n_p:, :n_p], x_ref[...])
        kff = -(u + Kx)
        xu = _dotg(M_k, jnp.concatenate([x_ref[...], kff], axis=0))
        x_next = xu[:n_p] + Ck[:n_p, o_c:o_c + 1]
        gh = _dotg(G, jnp.concatenate([x_next, u], axis=0))
        yk = y_ref_blk[0, 0]
        vmax = acc_ref[4:5, :]
        gap = acc_ref[5:6, :]
        for lo, hi in h_chunks:
            h_j = Ck[: hi - lo, o_h + (lo // np_pp):o_h
                     + (lo // np_pp) + 1]
            gj = gh[lo:hi] - h_j
            vmax = jnp.maximum(vmax, jnp.max(gj, axis=0, keepdims=True))
            gap = gap + jnp.sum(yk[lo:hi] * gj, axis=0, keepdims=True)
        acc_ref[4:5, :] = vmax
        acc_ref[5:6, :] = gap
        x_ref[...] = x_next

    x_ref[...] = x0
    acc_ref[4:5, :] = jnp.full((1, B_t), -jnp.inf, dtype=f32)
    acc_ref[5:6, :] = jnp.zeros((1, B_t), dtype=f32)
    pltpu.emit_pipeline(
        epi_body,
        grid=(N,),
        in_specs=[y_spec(r_fin, kfwd), cp_spec(kfwd)],
    )(Y_hbm, CP_hbm)

    diag_ref[...] = jnp.zeros((8, B_t), dtype=f32)
    diag_ref[0:1, :] = jnp.maximum(acc_ref[4:5, :], 0.0)
    diag_ref[1:2, :] = -acc_ref[5:6, :]
    u0_ref[...] = zu_ref[0]

    # averaged plan out (resident scratch -> HBM, one DMA per tile)
    dma_zu = pltpu.make_async_copy(
        zu_ref, zu_hbm.at[:, :, lane], sem.at[1]
    )
    dma_zu.start()
    dma_zu.wait()


@functools.partial(
    jax.jit,
    static_argnames=("iterations", "restart", "interpret"),
)
def solve_stagewise_stream(
    data,
    x0: jax.Array,
    *,
    iterations: int,
    restart: bool = False,
    interpret: bool = False,
    y0: "jax.Array | None" = None,
):
    """HBM-streamed fused stage-wise solve; same contract as
    ``solve_stagewise_pallas`` (``x0`` (B, n_x) -> (u0, zu, y, residual,
    gap)), for the big-state shapes the whole-VMEM kernel cannot build."""
    if interpret:
        _ensure_tpu_info_for_interpret()
    CP, GT, G, d = pack_stagewise_constants(data, lane_cap=None)
    N, n, p = d["N"], d["n"], d["p"]
    m_x, m_u = d["m_x"], d["m_u"]
    n_p, p_p = d["n_p"], d["p_p"]
    mx_p, mu_p, m_sp, np_pp = d["mx_p"], d["mu_p"], d["m_sp"], d["np_pp"]
    B = x0.shape[0]
    B_t = pick_stream_tile(N, n_p, p_p, mx_p, mu_p, CP.shape[-1])
    if B_t is None:
        raise ValueError("stagewise stream kernel: VMEM budget exceeded")
    B_t = min(B_t, _round_up(B, LANE))
    B_p = _round_up(B, B_t)
    f32 = jnp.float32

    if y0 is None:
        y0_pack = jnp.zeros((N, m_sp, B_p), dtype=f32)
    else:
        y0b = jnp.broadcast_to(jnp.asarray(y0, f32), (B, N, m_x + m_u))
        y0_pack = jnp.zeros((N, m_sp, B_p), dtype=f32)
        y0_pack = y0_pack.at[:, :m_x, :B].set(
            jnp.moveaxis(y0b[..., :m_x], 0, -1))
        y0_pack = y0_pack.at[:, mx_p:mx_p + m_u, :B].set(
            jnp.moveaxis(y0b[..., m_x:], 0, -1))

    x0T = _pad_axis(_pad_axis(x0.astype(f32).T, n_p, 0), B_p, 1)
    theta = data.theta[:iterations].astype(f32)
    beta = data.beta[:iterations].astype(f32)
    invl = (1.0 / data.L.astype(f32)).reshape((1,))

    kernel = functools.partial(
        _stream_kernel, N=N, n_p=n_p, p_p=p_p, mx_p=mx_p, mu_p=mu_p,
        iterations=iterations, restart=restart,
    )
    lane2 = lambda rows: pl.BlockSpec(
        (rows, B_t), lambda i, *_: (0, i), memory_space=pltpu.VMEM
    )
    const2 = lambda M: pl.BlockSpec(
        M.shape, lambda i, *_: (0,) * M.ndim, memory_space=pltpu.VMEM
    )
    any_spec = pl.BlockSpec(memory_space=pl.ANY)

    in_specs = [
        any_spec,  # y0
        lane2(n_p),  # x0
        any_spec,  # CP (streamed)
        const2(GT), const2(G),
    ]
    out_specs = [
        any_spec,  # Y rotation workspace (HBM)
        any_spec,  # zu
        lane2(p_p),  # u0
        lane2(8),  # diag
    ]
    out_shape = [
        jax.ShapeDtypeStruct((3, N, m_sp, B_p), f32),
        jax.ShapeDtypeStruct((N, p_p, B_p), f32),
        jax.ShapeDtypeStruct((p_p, B_p), f32),
        jax.ShapeDtypeStruct((8, B_p), f32),
    ]
    scratch = [
        pltpu.VMEM((N, n_p, B_t), f32),
        pltpu.VMEM((N, p_p, B_t), f32),
        pltpu.VMEM((n_p, B_t), f32),
        pltpu.VMEM((p_p, B_t), f32),
        pltpu.VMEM((n_p, B_t), f32),
        pltpu.VMEM((8, B_t), f32),
        pltpu.SemaphoreType.DMA((2,)),
    ]
    Y, zu, u0, diag = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(B_p // B_t,),
            in_specs=in_specs,
            out_specs=out_specs,
            scratch_shapes=scratch,
        ),
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=2
            * iterations
            * N
            * B_p
            * (2 * np_pp * m_sp + 3 * np_pp * np_pp),
            bytes_accessed=4 * B_p * N * iterations * (7 * m_sp),
            transcendentals=0,
        ),
        interpret=interpret,
    )(theta, beta, invl, y0_pack, x0T, CP, GT, G)

    y = Y[iterations % 3]
    u0 = u0[:p, :B].T
    zu_b = jnp.moveaxis(zu[:, :p, :B], -1, 0)
    y_b = jnp.concatenate(
        [
            jnp.moveaxis(y[:, :m_x, :B], -1, 0),
            jnp.moveaxis(y[:, mx_p:mx_p + m_u, :B], -1, 0),
        ],
        axis=-1,
    )
    residual = diag[0, :B]
    gap = diag[1, :B]
    return u0, zu_b, y_b, residual, gap

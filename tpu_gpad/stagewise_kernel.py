"""Fused Pallas kernel for the stage-wise (non-condensed) GPAD engine.

Why a kernel: the XLA stage-wise path (``stagewise._solve_one``) vmaps a
``lax.scan`` whose per-stage body is a (B, n) @ (n, n) matmul with n as
small as 8 — the MXU pads both contraction dims to 128, so utilization is
(n/128)^2 ~ 0.4% at the battery n=8 shapes and each of the 2N scan steps
pays an HBM round-trip for its (B, n) carry. Chip-measured: ~56 us per
scan step at n=8, N=240, B=4096 where the useful math is <3 us.

The kernel applies the same scenario-minor layout as the condensed
kernels (``solver/kernels.py``): every per-stage quantity is stored
(stage, rows, B_t) with the BATCH on the 128-wide lanes and the small
state/dual dimension on sublanes, and the ENTIRE fixed-budget solve —
all iterations, both sweeps, constraint algebra, momentum, optional
restart — runs in one kernel invocation per batch tile with zero HBM
traffic inside the loop.

Two VMEM lessons are baked in (both chip-verified):

- a separate (N, r, c<=8) VMEM array per stage constant pays the
  physical (8, 128) tile for its <=8 lanes — 16x waste, 20.7 MB scoped
  OOM at n=8 N=240. ALL per-stage constants are packed into ONE
  (N, r_max, C<=128) array sharing lane tiles, and the stage-invariant
  constraint maps are packed block-diagonally so the hot recursions are
  a handful of fused dots;
- the big dual/plan state lives in single-buffered SCRATCH and leaves
  via one explicit DMA to ANY-space outputs per tile (outputs as
  lane-blocked VMEM would be double-buffered by the grid pipeline and
  double the footprint).

The algebra mirrors ``stagewise._lqr_solve``/``_solve_one`` exactly
(iterate parity tested):

    backward   s_k   = qx_k + E_k' s_{k+1} - K_k' ru_{k+1}
    forward    kff_k = Hi_k (B_k' stilde_k + ru_k)
               u_k   = -K_k x_k - kff_k
               x_{k+1} = E_k x_k - B_k kff_k
    packed as  [qx; ru]_k   = GT_pack w_k              (one dot)
               s_k          = qx_k + R_k [s; ru_{k+1}] (one dot)
               kff_k        = HB_k [stilde_k; ru_k]    (one dot)
               [x'; u]_k    = M_k [x; kff]             (one dot)
               g_k          = G_pack [x'; u] - h_k     (one dot)
    with R = [E' | -K'], HB = [HiB' | Hi], M = [[E, -B], [-K, -I]].

Reference anchor: the L2 runtime role (``main.cu:160-175``) for the
paper's O(N) variant (nmpc12-gpad.pdf p.3) the reference never built.

Scope (v2): mode="fixed" (+ adaptive restart), cold OR warm dual starts
(warm = the serving path: the incoming stage-packed dual is DMA'd from
HBM into the same scratch the cold path zeros — so ``StagewiseController``
fleets ride the kernel), hard per-stage rows with m_x > 0 and m_u > 0.
Eps mode and degenerate row sets route to the XLA stage-wise path.
Routing between this kernel and the XLA path is chip-measured — see
``stagewise_kernel_wins`` and STAGEWISE.json.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
SUBLANE = 8
# This kernel's state is SINGLE-buffered scratch (results leave via one
# explicit DMA per tile), so unlike the condensed kernels there is no 2x
# grid double-buffering to leave headroom for — budget close to the 16 MB
# physical VMEM. Chip-verified: the n8 N240 B_t=128 working set (~15 MB,
# matching Mosaic's scoped-vmem accounting within 2%) compiles; the
# padded-constants version at 20.7 MB was rejected by the compiler.
_VMEM_BUDGET = 15 * 1024 * 1024

_HI = jax.lax.Precision.HIGHEST


def _round_up(x: int, mult: int) -> int:
    return ((x + mult - 1) // mult) * mult


def _pad_axis(x, size: int, axis: int):
    pad = size - x.shape[axis]
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def pick_stagewise_tile(N: int, n_p: int, p_p: int, mx_p: int, mu_p: int):
    """Largest batch-tile (lane) width whose VMEM working set fits the
    budget, or None. fp32 elements per lane:

    - packed dual state y + y_prev: 2 * N * (mx_p + mu_p)
    - stilde + averaged plan zu: N * (n_p + p_p)
    - x0 in / u0+diag out blocks (double-buffered): small
    plus the lane-independent packed constants. Mosaic requires lane
    blocks divisible by 128, so candidates start there."""
    m_rows = mx_p + mu_p
    per_lane = 4 * (
        2 * N * m_rows
        + N * (n_p + p_p)
        + 2 * (n_p + p_p + 8)
        + 4 * SUBLANE
    )
    r_max = n_p + p_p  # CP rows; h folds into extra CP columns
    consts = 4 * N * r_max * LANE + 4 * (
        2 * (mx_p + mu_p) * (n_p + p_p)
    )
    for b_t in (512, 256, 128):
        if consts + per_lane * b_t <= _VMEM_BUDGET:
            return b_t
    return None


def stagewise_kernel_wins(N: int, B: int, data) -> bool:
    """Chip-measured routing rule for engine='auto' (STAGEWISE.json,
    round-4 executor ladder at battery n=8). The kernel's per-(tile,
    stage) cost is latency-bound and lane-count-independent, so it wins
    when lanes are full and the grid short (big B, moderate N: 1.2-2.1x
    the sequential XLA scan and ahead of the parallel-prefix path), and
    loses both to the XLA scan's whole-batch amortization at many
    serialized tiles (32 tiles: 0.71x) and to the log-depth
    associative-scan path in the latency regime (N=240 B=128: kernel
    8.4k vs assoc 14.1k solves/s). Measured boundary: B/N >= 24 AND
    <= 16 tiles."""
    n_p = _round_up(data.n_x, SUBLANE)
    p_p = _round_up(data.n_u, SUBLANE)
    mx_p = _round_up(data.m_x, SUBLANE)
    mu_p = _round_up(data.m_u, SUBLANE)
    b_t = pick_stagewise_tile(N, n_p, p_p, mx_p, mu_p)
    if b_t is None:
        return False
    return B >= 24 * N and -(-B // b_t) <= 16


def _dotg(M, x):
    """(r, c) @ (c, B) inside the kernel — let Mosaic choose the unit."""
    return jax.lax.dot_general(
        M, x, (((1,), (0,)), ((), ())), precision=_HI,
        preferred_element_type=jnp.float32,
    )


def _stagewise_kernel(
    # scalar prefetch
    theta_ref,
    beta_ref,
    invl_ref,
    # inputs
    y0_hbm,  # (N, m_sp, B_p) ANY: warm-start dual (all-zeros when cold;
    #          staged into y_ref by ONE DMA per tile — as a lane-blocked
    #          VMEM input it would be double-buffered by the grid
    #          pipeline, the exact footprint lesson the outputs taught)
    x0_ref,  # (n_p, B_t)
    CP_ref,  # (N, np_pp, C) packed per-stage constants: [R|HB|M|h-cols]
    #          h's m_sp rows fold into ceil(m_sp/np_pp) EXTRA COLUMNS of
    #          the same tile (a (N, m_sp, 1) h array would pay the
    #          physical 128-lane tile per stage — 4.9 MB at n8 N240 — and
    #          a (m_sp, N) stage-on-lanes layout needs a dynamic-lane
    #          vector load Mosaic cannot lower)
    GT_ref,  # (n_p + p_p, m_sp) block-diag [[Gx', 0], [0, Gu']]
    G_ref,  # (m_sp, n_p + p_p) block-diag [[Gx, 0], [0, Gu]]
    # outputs
    y_hbm,  # (N, m_sp, B_p) ANY: packed dual, DMA'd out once per tile
    zu_hbm,  # (N, p_p, B_p) ANY: averaged input plan
    u0_ref,  # (p_p, B_t)
    diag_ref,  # (8, B_t) rows: 0 residual, 1 gap
    # scratch
    y_ref,  # (N, m_sp, B_t) packed dual [yx; yu]
    yp_ref,  # (N, m_sp, B_t)
    st_ref,  # (N, n_p, B_t) stilde
    zu_ref,  # (N, p_p, B_t) averaged plan
    sem,  # DMA semaphores (2,)
    *,
    N: int,
    n_p: int,
    p_p: int,
    mx_p: int,
    mu_p: int,
    iterations: int,
    restart: bool,
    warm: bool,
):
    B_t = x0_ref.shape[-1]
    f32 = jnp.float32
    inv_L = invl_ref[0]
    zero_row = jnp.zeros((1, B_t), dtype=f32)
    one_row = jnp.ones((1, B_t), dtype=f32)
    np_pp = n_p + p_p

    # static column offsets into the packed constant tile
    o_R = 0
    o_HB = o_R + np_pp
    o_M = o_HB + np_pp
    o_h = o_M + np_pp
    m_sp = mx_p + mu_p
    n_hcols = -(-m_sp // np_pp)
    o_dtl = o_h + n_hcols  # Ptilde_{k+1} c_k (n_p rows)
    o_qoff = o_dtl + 1  # folded E'dtl shift + fixed-ref linear cost
    o_c = o_qoff + 1  # dynamics offset c_k
    # h chunks: chunk j holds rows [j*np_pp, min((j+1)*np_pp, m_sp)) of
    # the stage's h as CP column o_h + j. Mosaic cannot concatenate
    # vector slices living at different lane offsets, so h is never
    # assembled into one (m_sp, 1) column — every consumer applies it
    # chunk-by-chunk over the matching sublane rows.
    h_chunks = [
        (j * np_pp, min((j + 1) * np_pp, m_sp)) for j in range(n_hcols)
    ]

    lane = pl.ds(pl.program_id(0) * B_t, B_t)
    if warm:
        # warm start: stage the incoming dual into scratch with one DMA,
        # then mirror the XLA path's carry init (y_prev = y0, so the
        # first w has a zero momentum term)
        dma_y0 = pltpu.make_async_copy(
            y0_hbm.at[:, :, lane], y_ref, sem.at[0]
        )
        dma_y0.start()
        dma_y0.wait()

        def _init_warm(k, _):
            yp_ref[k] = y_ref[k]
            zu_ref[k] = jnp.zeros(zu_ref.shape[1:], dtype=zu_ref.dtype)
            return 0

        jax.lax.fori_loop(0, N, _init_warm, 0)
    else:
        # cold start, PER STAGE (a whole-array jnp.zeros temporary would
        # land on the scoped-vmem stack and OOM)
        def _zero(k, _):
            for ref in (y_ref, yp_ref, zu_ref):
                ref[k] = jnp.zeros(ref.shape[1:], dtype=ref.dtype)
            return 0

        jax.lax.fori_loop(0, N, _zero, 0)

    x0 = x0_ref[...]
    GT = GT_ref[...]
    G = G_ref[...]

    def w_at(k, b):
        y = y_ref[k]
        return y + b * (y - yp_ref[k])

    def iteration(i, carry):
        th_c, th_p = carry
        if restart:
            th = th_c  # (1, B_t) per-scenario
            b = th_c * (1.0 / th_p - 1.0)
        else:
            th = theta_ref[i]
            b = beta_ref[i]

        # ---- backward sweep: st[k] = s_{k+1} ---------------------------
        # (qoff folds the affine-dynamics shift E'dtl and any fixed-ref
        # linear cost into the qx part, mirroring data.qoff)
        qr_last = _dotg(GT, w_at(N - 1, b))  # [qx; ru] at stage N-1
        st_ref[N - 1] = (
            qr_last[:n_p] + CP_ref[N - 1][:n_p, o_qoff:o_qoff + 1]
        )

        def bwd(t, qr_next):
            # qr_next = [qx; ru] at stage k+1; recursion uses ru_{k+1}
            k = N - 2 - t
            qr_k = _dotg(GT, w_at(k, b))
            sru = jnp.concatenate([st_ref[k + 1], qr_next[n_p:]], axis=0)
            Ck = CP_ref[k]
            R_k1 = CP_ref[k + 1][:n_p, o_R:o_R + np_pp]
            st_ref[k] = (
                qr_k[:n_p]
                + Ck[:n_p, o_qoff:o_qoff + 1]
                + _dotg(R_k1, sru)
            )
            return qr_k

        jax.lax.fori_loop(0, N - 1, bwd, qr_last)

        # ---- forward rollout + stage-local dual update ------------------
        def fwd(k, carry_f):
            x, racc = carry_f
            Ck = CP_ref[k]
            HB_k = Ck[:p_p, o_HB:o_HB + np_pp]
            M_k = Ck[:np_pp, o_M:o_M + np_pp]
            wk = w_at(k, b)
            ru_k = _dotg(GT, wk)[n_p:]
            st_k = st_ref[k] + Ck[:n_p, o_dtl:o_dtl + 1]
            kff = _dotg(HB_k, jnp.concatenate([st_k, ru_k], axis=0))
            xu = _dotg(M_k, jnp.concatenate([x, kff], axis=0))
            x_next = xu[:n_p] + Ck[:n_p, o_c:o_c + 1]
            u = xu[n_p:]
            # primal averaging (z = (1-th) z + th zhat); the averaged
            # states are NOT stored — the epilogue recomputes them by
            # rolling zu through the dynamics (x is linear in u and the
            # convex-combination step 3 preserves it)
            zu_ref[k] = (1.0 - th) * zu_ref[k] + th * u
            # dual gradient rows and projected ascent, h chunk-wise
            gh = _dotg(G, jnp.concatenate([x_next, u], axis=0))
            y_old = y_ref[k]
            yp_ref[k] = y_old
            for lo, hi in h_chunks:
                h_j = Ck[: hi - lo, o_h + (lo // np_pp):o_h
                         + (lo // np_pp) + 1]
                y_new = jnp.maximum(
                    wk[lo:hi] + inv_L * (gh[lo:hi] - h_j), 0.0
                )
                if restart:
                    racc = racc + jnp.sum(
                        (wk[lo:hi] - y_new) * (y_new - y_old[lo:hi]),
                        axis=0,
                        keepdims=True,
                    )
                y_ref[k, lo:hi, :] = y_new
            return x_next, racc

        _, racc = jax.lax.fori_loop(0, N, fwd, (x0, zero_row))

        if restart:
            mask = racc > 0.0

            def fix(k, _):
                yp_ref[k] = jnp.where(mask, y_ref[k], yp_ref[k])
                return 0

            jax.lax.fori_loop(0, N, fix, 0)
            th_n = jnp.where(
                mask, 1.0, th_c * (jnp.sqrt(th_c * th_c + 4.0) - th_c) * 0.5
            )
            th_p_n = jnp.where(mask, 1.0, th_c)
            return th_n, th_p_n
        return th_c, th_p

    jax.lax.fori_loop(0, iterations, iteration, (one_row, one_row))

    # ---- epilogue: residual/gap on the averaged primal, matching
    # stagewise._solve_one. Roll the averaged plan zu through the
    # dynamics via kff = -(u + K x): x' = E x - B kff = (M [x; kff])[:n]
    # (M's lower-left block is -K, so K x = -(that block) x). -----------
    def epi(k, carry_e):
        x, vmax, gap = carry_e
        Ck = CP_ref[k]
        M_k = Ck[:np_pp, o_M:o_M + np_pp]
        u = zu_ref[k]
        Kx = -_dotg(M_k[n_p:, :n_p], x)
        kff = -(u + Kx)
        xu = _dotg(M_k, jnp.concatenate([x, kff], axis=0))
        x_next = xu[:n_p] + Ck[:n_p, o_c:o_c + 1]
        gh = _dotg(G, jnp.concatenate([x_next, u], axis=0))
        yk = y_ref[k]
        for lo, hi in h_chunks:
            h_j = Ck[: hi - lo, o_h + (lo // np_pp):o_h
                     + (lo // np_pp) + 1]
            gj = gh[lo:hi] - h_j
            vmax = jnp.maximum(vmax, jnp.max(gj, axis=0, keepdims=True))
            gap = gap + jnp.sum(yk[lo:hi] * gj, axis=0, keepdims=True)
        return x_next, vmax, gap

    _, vmax, gap = jax.lax.fori_loop(
        0, N, epi, (x0, jnp.full((1, B_t), -jnp.inf, dtype=f32), zero_row)
    )
    diag_ref[...] = jnp.zeros((8, B_t), dtype=f32)
    diag_ref[0:1, :] = jnp.maximum(vmax, 0.0)
    diag_ref[1:2, :] = -gap
    u0_ref[...] = zu_ref[0]

    # one DMA per result array out to HBM (ANY space)
    copies = (
        (y_ref, y_hbm.at[:, :, lane], 0),
        (zu_ref, zu_hbm.at[:, :, lane], 1),
    )
    dmas = [
        pltpu.make_async_copy(src, dst, sem.at[k]) for src, dst, k in copies
    ]
    for dma in dmas:
        dma.start()
    for dma in dmas:
        dma.wait()


def stagewise_kernel_compatible(data) -> tuple:
    """(ok, reason): can this StagewiseData ride the fused kernel?"""
    if data.m_x == 0 or data.m_u == 0:
        return False, "kernel needs m_x > 0 and m_u > 0 (inert-pad rows)"
    n_p = _round_up(data.n_x, SUBLANE)
    p_p = _round_up(data.n_u, SUBLANE)
    mx_p = _round_up(data.m_x, SUBLANE)
    mu_p = _round_up(data.m_u, SUBLANE)
    np_pp = n_p + p_p
    if 3 * np_pp + -(-(mx_p + mu_p) // np_pp) + 3 > LANE:
        return False, "stage constants exceed one packed 128-lane tile"
    if pick_stagewise_tile(data.horizon, n_p, p_p, mx_p, mu_p) is None:
        return False, "VMEM budget exceeded (horizon too long for the tile)"
    return True, ""


def pack_stagewise_constants(data, lane_cap: "int | None" = LANE):
    """Pack the per-stage constants into the shared kernel layout.

    Returns ``(CP, GT, G, dims)`` with ``CP`` (N, np_pp, C): per-stage
    [R | HB | M | h-cols | dtl | qoff | c] sharing one row-block (the
    whole-VMEM kernel requires C <= 128, one physical lane tile; the
    HBM-streamed kernel passes ``lane_cap=None`` and pads C to a
    multiple of 128 instead), plus the stage-invariant block-diagonal
    constraint maps ``GT``/``G``. ``dims`` carries every padded extent."""
    N = data.horizon
    n, p = data.n_x, data.n_u
    m_x, m_u = data.m_x, data.m_u
    n_p = _round_up(n, SUBLANE)
    p_p = _round_up(p, SUBLANE)
    mx_p = _round_up(m_x, SUBLANE)
    mu_p = _round_up(m_u, SUBLANE)
    m_sp = mx_p + mu_p
    np_pp = n_p + p_p
    f32 = jnp.float32
    pad_r = lambda M: _pad_axis(M.astype(f32), np_pp, 1)
    KT = jnp.swapaxes(data.K.astype(f32), 1, 2)  # (N, n, p)
    ET = jnp.swapaxes(data.E.astype(f32), 1, 2)
    HiBt = jnp.einsum(
        "kpq,knq->kpn", data.Hi.astype(f32), data.B_seq.astype(f32),
        precision=_HI,
    )
    eye_p = jnp.broadcast_to(jnp.eye(p, dtype=f32), (N, p, p))
    # R = [E' | -K'] (n, n+p); HB = [HiB' | Hi] (p, n+p);
    # M = [[E, -B], [-K, -I]] (n+p, n+p); h = [hx; hu] column
    R = jnp.concatenate(
        [_pad_axis(ET, n_p, 2), _pad_axis(-KT, p_p, 2)], axis=2
    )
    HB = jnp.concatenate(
        [_pad_axis(HiBt, n_p, 2),
         _pad_axis(data.Hi.astype(f32), p_p, 2)],
        axis=2,
    )
    M_top = jnp.concatenate(
        [_pad_axis(data.E.astype(f32), n_p, 2),
         _pad_axis(-data.B_seq.astype(f32), p_p, 2)],
        axis=2,
    )
    M_bot = jnp.concatenate(
        [_pad_axis(-data.K.astype(f32), n_p, 2),
         _pad_axis(-eye_p, p_p, 2)],
        axis=2,
    )
    M_pack = jnp.concatenate(
        [_pad_axis(M_top, n_p, 1),
         _pad_axis(M_bot, p_p, 1)],
        axis=1,
    )
    # h pads are ZERO: padded G rows are zero so g_pad = -h_pad = 0 keeps
    # padded duals at relu(0 + 0) = 0 (inert), contributing nothing to
    # qx/ru, the clamped residual max or the gap. Fold h's m_sp rows into
    # extra columns of the np_pp-row CP tile.
    n_hcols = -(-m_sp // np_pp)
    h_flat = jnp.concatenate(
        [_pad_axis(data.hx.astype(f32), mx_p, 1),
         _pad_axis(data.hu.astype(f32), mu_p, 1)],
        axis=1,
    )  # (N, m_sp)
    h_cols = _pad_axis(h_flat, n_hcols * np_pp, 1).reshape(
        N, n_hcols, np_pp
    ).transpose(0, 2, 1)  # (N, np_pp, n_hcols)
    extra_cols = jnp.stack(
        [
            _pad_axis(data.dtl.astype(f32), n_p, 1),
            _pad_axis(data.qoff.astype(f32), n_p, 1),
            _pad_axis(data.c_seq.astype(f32), n_p, 1),
        ],
        axis=2,
    )  # (N, n_p, 3): [dtl | qoff | c]
    CP = jnp.concatenate(
        [pad_r(R), pad_r(HB), pad_r(M_pack), h_cols,
         _pad_axis(extra_cols, np_pp, 1)],
        axis=2,
    )
    if lane_cap is None:
        CP = _pad_axis(CP, _round_up(CP.shape[2], LANE), 2)
    # block-diagonal constraint maps (stage-invariant)
    Gx = _pad_axis(_pad_axis(data.Gx.astype(f32), mx_p, 0), n_p, 1)
    Gu = _pad_axis(_pad_axis(data.Gu.astype(f32), mu_p, 0), p_p, 1)
    G = jnp.zeros((m_sp, np_pp), dtype=f32)
    G = G.at[:mx_p, :n_p].set(Gx).at[mx_p:, n_p:].set(Gu)
    dims = dict(N=N, n=n, p=p, m_x=m_x, m_u=m_u, n_p=n_p, p_p=p_p,
                mx_p=mx_p, mu_p=mu_p, m_sp=m_sp, np_pp=np_pp,
                n_hcols=n_hcols)
    return CP, G.T, G, dims


@functools.partial(
    jax.jit,
    static_argnames=("iterations", "restart", "interpret"),
)
def solve_stagewise_pallas(
    data,
    x0: jax.Array,
    *,
    iterations: int,
    restart: bool = False,
    interpret: bool = False,
    y0: "jax.Array | None" = None,
):
    """Fused-kernel stage-wise solve. ``x0`` is (B, n_x); returns
    ``(u0, zu, y, residual, gap)`` with ``zu`` (B, N, n_u) and ``y``
    (B, N, m_x + m_u) matching ``solve_stagewise``'s packing.

    ``y0`` (broadcastable to (B, N, m_x + m_u), ``solve_stagewise``'s
    stage-packed layout) warm-starts the dual — v2: the serving path
    (``StagewiseController`` fleets) no longer falls off the kernel. The
    warm dual rides to the kernel in HBM (ANY space) and is staged into
    the single-buffered scratch by one DMA per tile; a lane-blocked VMEM
    input would be double-buffered by the grid pipeline (the v1 footprint
    lesson)."""
    CP, GT, G, dd = pack_stagewise_constants(data)
    N, n, p = dd["N"], dd["n"], dd["p"]
    m_x, m_u = dd["m_x"], dd["m_u"]
    n_p, p_p = dd["n_p"], dd["p_p"]
    mx_p, mu_p = dd["mx_p"], dd["mu_p"]
    m_sp, np_pp = dd["m_sp"], dd["np_pp"]
    B = x0.shape[0]
    B_t = pick_stagewise_tile(N, n_p, p_p, mx_p, mu_p)
    if B_t is None:
        raise ValueError("stagewise kernel: VMEM budget exceeded")
    B_p = _round_up(B, B_t)
    f32 = jnp.float32

    x0T = _pad_axis(_pad_axis(x0.astype(f32).T, n_p, 0), B_p, 1)
    theta = data.theta[:iterations].astype(f32)
    beta = data.beta[:iterations].astype(f32)
    invl = (1.0 / data.L.astype(f32)).reshape((1,))

    warm = y0 is not None
    if warm:
        y0b = jnp.broadcast_to(
            jnp.asarray(y0, f32), (B, N, m_x + m_u)
        )
        y0_pack = jnp.zeros((N, m_sp, B_p), dtype=f32)
        y0_pack = y0_pack.at[:, :m_x, :B].set(
            jnp.moveaxis(y0b[..., :m_x], 0, -1)
        )
        y0_pack = y0_pack.at[:, mx_p:mx_p + m_u, :B].set(
            jnp.moveaxis(y0b[..., m_x:], 0, -1)
        )
    else:
        y0_pack = jnp.zeros((1, 1, 1), dtype=f32)  # unused dummy (ANY)

    kernel = functools.partial(
        _stagewise_kernel, N=N, n_p=n_p, p_p=p_p, mx_p=mx_p, mu_p=mu_p,
        iterations=iterations, restart=restart, warm=warm,
    )
    lane2 = lambda rows: pl.BlockSpec(
        (rows, B_t), lambda i, *_: (0, i), memory_space=pltpu.VMEM
    )
    const2 = lambda M: pl.BlockSpec(
        M.shape, lambda i, *_: (0,) * M.ndim, memory_space=pltpu.VMEM
    )
    any_spec = pl.BlockSpec(memory_space=pl.ANY)

    in_specs = [
        any_spec,  # y0 warm-start dual (HBM; DMA'd in, dummy when cold)
        lane2(n_p),  # x0
        const2(CP), const2(GT), const2(G),
    ]
    out_specs = [
        any_spec,  # y (HBM, DMA'd)
        any_spec,  # zu
        lane2(p_p),  # u0
        lane2(8),  # diag
    ]
    out_shape = [
        jax.ShapeDtypeStruct((N, m_sp, B_p), f32),
        jax.ShapeDtypeStruct((N, p_p, B_p), f32),
        jax.ShapeDtypeStruct((p_p, B_p), f32),
        jax.ShapeDtypeStruct((8, B_p), f32),
    ]
    scratch = [
        pltpu.VMEM((N, m_sp, B_t), f32),
        pltpu.VMEM((N, m_sp, B_t), f32),
        pltpu.VMEM((N, n_p, B_t), f32),
        pltpu.VMEM((N, p_p, B_t), f32),
        pltpu.SemaphoreType.DMA((2,)),
    ]
    y, zu, u0, diag = pl.pallas_call(
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
            bytes_accessed=4 * B_p * N * (2 * m_sp + n_p + p_p),
            transcendentals=0,
        ),
        interpret=interpret,
    )(theta, beta, invl, y0_pack, x0T, CP, GT, G)

    u0 = u0[:p, :B].T
    zu_b = jnp.moveaxis(zu[:, :p, :B], -1, 0)  # (B, N, p)
    y_b = jnp.concatenate(
        [
            jnp.moveaxis(y[:, :m_x, :B], -1, 0),
            jnp.moveaxis(y[:, mx_p:mx_p + m_u, :B], -1, 0),
        ],
        axis=-1,
    )  # (B, N, m_x + m_u)
    residual = diag[0, :B]
    gap = diag[1, :B]
    return u0, zu_b, y_b, residual, gap

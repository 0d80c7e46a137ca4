"""Frame-dense factor graph — the TPU speed-of-light assembly path.

The swarm problem has rigid structure the generic scatter-based path
(solver/graph.py + gauss_newton.py) ignores:

- UWB ranges and visual detections connect two drones *in the same frame* →
  a dense (F, D, D) measurement grid;
- ego-motion factors connect consecutive frames of one drone → a dense
  (F-1, D) chain;
- only loop closures are genuinely sparse (and few).

This module exploits that: residuals and *analytic* Jacobians are computed
as component-wise array programs over (F, D, D) / (F-1, D) grids (full VPU
lane utilization — no (K, 4) small-trailing-dim layouts), and the Hessian is
assembled by dense masked einsums instead of scatter-adds. Only the loop
factors use one small scatter.

The normal-equation output is identical (up to float order) to
gauss_newton.assemble_normal_equations on the equivalent sparse graph —
tested in tests/test_dense_solver.py.
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from omniswarm_tpu.core import geometry as geo
from omniswarm_tpu.core.precision import highp
from omniswarm_tpu.solver import factors as fx
from omniswarm_tpu.solver.graph import RelPoseFactors, empty_relpose


class DenseGraph(NamedTuple):
    # UWB ranges: (F, D, D) upper-triangle-valid grid
    range_dist: jnp.ndarray       # (F, D, D)
    range_valid: jnp.ndarray      # (F, D, D) bool (use a<b half)
    range_sqrt_inf: jnp.ndarray   # () or (F, D, D)
    # Ego-motion chain between consecutive frames
    odom_dpose: jnp.ndarray       # (F-1, D, 4)
    odom_sqrt_info: jnp.ndarray   # (F-1, D, 4) diagonal sqrt information
    odom_valid: jnp.ndarray       # (F-1, D) bool
    # Same-frame drone detections a→b (bearing + inverse depth)
    det_dir: jnp.ndarray          # (F, D, D, 3) unit bearing in a's frame
    det_tb: jnp.ndarray           # (F, D, D, 2, 3) tangent basis
    det_invdep: jnp.ndarray       # (F, D, D)
    det_valid: jnp.ndarray        # (F, D, D) bool
    det_has_depth: jnp.ndarray    # (F, D, D) bool
    # Sparse loop closures (reuses the generic container)
    loops: RelPoseFactors
    # Pose masks
    pose_valid: jnp.ndarray       # (F, D)
    pose_fixed: jnp.ndarray       # (F, D)
    yaw_fixed: jnp.ndarray        # (F, D)
    # Optional per-drone UWB antenna offsets (D, 3), body frame; None == all
    # zero (keeps the antisymmetric fast assembly). anntena_pos in
    # swarm_nodes5.yaml, swarm_localization_node.cpp:300-328.
    ant_pos: jnp.ndarray = None


def empty_dense_graph(F: int, D: int, max_loops: int = 256,
                      dtype=jnp.float32) -> DenseGraph:
    return DenseGraph(
        range_dist=jnp.zeros((F, D, D), dtype),
        range_valid=jnp.zeros((F, D, D), bool),
        range_sqrt_inf=jnp.asarray(1.0, dtype),
        odom_dpose=jnp.zeros((max(F - 1, 1), D, 4), dtype),
        odom_sqrt_info=jnp.zeros((max(F - 1, 1), D, 4), dtype),
        odom_valid=jnp.zeros((max(F - 1, 1), D), bool),
        det_dir=jnp.zeros((F, D, D, 3), dtype),
        det_tb=jnp.zeros((F, D, D, 2, 3), dtype),
        det_invdep=jnp.zeros((F, D, D), dtype),
        det_valid=jnp.zeros((F, D, D), bool),
        det_has_depth=jnp.zeros((F, D, D), bool),
        loops=empty_relpose(max_loops, dtype),
        pose_valid=jnp.zeros((F, D), bool),
        pose_fixed=jnp.zeros((F, D), bool),
        yaw_fixed=jnp.zeros((F, D), bool),
    )


# ---------------------------------------------------------------------------
# Residual/Jacobian grids (analytic, component-wise)
# ---------------------------------------------------------------------------

def _range_terms(graph: DenseGraph, poses, huber_delta):
    """Range residual grid + analytic Jacobian grid.

    r[f,a,b] = (||t_a - t_b|| - d) * si.  dr/dta = si*u, dr/dtb = -si*u.
    Returns (r, u, w) with w = huber * valid weight (applied squared later).
    """
    t = poses[..., :3]
    diff = t[:, :, None, :] - t[:, None, :, :]          # (F, D, D, 3)
    dist = jnp.sqrt(jnp.sum(diff * diff, -1) + 1e-12)
    si = jnp.asarray(graph.range_sqrt_inf)
    r = (dist - graph.range_dist) * si
    u = diff / dist[..., None]
    si = si[..., None]      # broadcast over the xyz axis (scalar or grid)
    w = jnp.where(jnp.abs(r) <= huber_delta, 1.0,
                  huber_delta / jnp.maximum(jnp.abs(r), 1e-12))
    w = w * graph.range_valid.astype(poses.dtype)
    cost = 0.5 * jnp.sum(jnp.where(graph.range_valid,
                                   fx.huber_rho(r * r, huber_delta), 0.0))
    return r, u * si, w, cost


def _range_terms_ant(graph: DenseGraph, poses, huber_delta):
    """Range residual/Jacobian grids with per-drone antenna offsets.

    Ranged point: t + R(yaw) @ ant (swarm_localization_node.cpp:300-328) —
    ranges couple into yaw. Returns (r, ja4, jb4, w, cost) with full
    4-component Jacobian rows (the antisymmetric 3-vector shortcut of
    _range_terms no longer applies because ka != kb).
    """
    dtype = poses.dtype
    ya = poses[..., 3]                                   # (F, D)
    ant = jnp.asarray(graph.ant_pos, dtype)              # (D, 3)
    rot = geo.yaw_rotate(ya, ant[None, :, :])            # (F, D, 3)
    teff = poses[..., :3] + rot
    diff = teff[:, :, None, :] - teff[:, None, :, :]     # (F, Da, Db, 3)
    dist = jnp.sqrt(jnp.sum(diff * diff, -1) + 1e-12)
    si = jnp.asarray(graph.range_sqrt_inf)
    r = (dist - graph.range_dist) * si
    u = diff / dist[..., None]
    # d(R(ya) ant_a)/dya = [-s*ax - c*ay, c*ax - s*ay, 0]
    c = jnp.cos(ya)
    s = jnp.sin(ya)
    dR = jnp.stack([-s * ant[None, :, 0] - c * ant[None, :, 1],
                    c * ant[None, :, 0] - s * ant[None, :, 1],
                    jnp.zeros_like(ya)], -1)             # (F, D, 3)
    ka = jnp.sum(u * dR[:, :, None, :], -1)              # (F, Da, Db)
    kb = jnp.sum(u * dR[:, None, :, :], -1)
    si_b = si[..., None] if jnp.ndim(si) else si
    ja4 = jnp.concatenate([u, ka[..., None]], -1) * si_b
    jb4 = -jnp.concatenate([u, kb[..., None]], -1) * si_b
    w = jnp.where(jnp.abs(r) <= huber_delta, 1.0,
                  huber_delta / jnp.maximum(jnp.abs(r), 1e-12))
    w = w * graph.range_valid.astype(dtype)
    cost = 0.5 * jnp.sum(jnp.where(graph.range_valid,
                                   fx.huber_rho(r * r, huber_delta), 0.0))
    return r, ja4, jb4, w, cost


def _odom_terms(graph: DenseGraph, poses, F):
    """Ego-motion residual chain + analytic Jacobians (diag sqrt info).

    e = meas - delta(a, b); delta_t = R(-ya)(tb-ta); e_yaw wrapped.
    Ja = diag(s) @ [[ R(-ya), [-dy, dx, 0]^T ], [0, 1]]
    Jb = diag(s) @ [[-R(-ya), 0], [0, -1]]
    """
    pa = poses[:-1]                                     # (F-1, D, 4)
    pb = poses[1:]
    delta = geo.delta_pose(pa, pb)                      # (F-1, D, 4)
    e = graph.odom_dpose - delta
    e = e.at[..., 3].set(geo.normalize_angle(e[..., 3]))
    s = graph.odom_sqrt_info                            # (F-1, D, 4)
    r = s * e
    valid = graph.odom_valid
    cost = 0.5 * jnp.sum(jnp.where(valid, jnp.sum(r * r, -1), 0.0))

    c = jnp.cos(pa[..., 3])
    sn = jnp.sin(pa[..., 3])
    zero = jnp.zeros_like(c)
    one = jnp.ones_like(c)
    # rotation rows of R(-ya): [[c, sn], [-sn, c]]
    # Ja rows (unscaled): [c, sn, 0, -dy], [-sn, c, 0, dx], [0,0,1,0], [0,0,0,1]
    dx_, dy_ = delta[..., 0], delta[..., 1]
    Ja = jnp.stack([
        jnp.stack([c, sn, zero, -dy_], -1),
        jnp.stack([-sn, c, zero, dx_], -1),
        jnp.stack([zero, zero, one, zero], -1),
        jnp.stack([zero, zero, zero, one], -1),
    ], -2) * s[..., :, None]                            # (F-1, D, 4, 4)
    Jb = jnp.stack([
        jnp.stack([-c, -sn, zero, zero], -1),
        jnp.stack([sn, -c, zero, zero], -1),
        jnp.stack([zero, zero, -one, zero], -1),
        jnp.stack([zero, zero, zero, -one], -1),
    ], -2) * s[..., :, None]
    return r, Ja, Jb, valid.astype(poses.dtype), cost


def _det_terms(graph: DenseGraph, poses, huber_delta, sphere_std,
               inv_dep_std):
    """Detection residual grid + Jacobians via closed-form chain rule.

    rel[f,a,b] = R(-ya)(tb - ta); unit = rel/n;
    res01 = TB @ (unit - dir)/σs; res2 = (invd - 1/n)/σi.
    """
    dtype = poses.dtype
    t = poses[..., :3]
    ya = poses[..., 3]                                  # (F, D)
    diff = t[:, None, :, :] - t[:, :, None, :]          # (F, Da, Db, 3) b-a
    c = jnp.cos(ya)[:, :, None]
    s = jnp.sin(ya)[:, :, None]
    relx = c * diff[..., 0] + s * diff[..., 1]
    rely = -s * diff[..., 0] + c * diff[..., 1]
    relz = diff[..., 2]
    rel = jnp.stack([relx, rely, relz], -1)             # (F, D, D, 3)
    n = jnp.sqrt(jnp.sum(rel * rel, -1) + 1e-12)
    unit = rel / n[..., None]
    err3 = unit - graph.det_dir
    res01 = jnp.einsum("fabkj,fabj->fabk", graph.det_tb, err3) / sphere_std
    res2 = (graph.det_invdep - 1.0 / n) / inv_dep_std
    res2 = res2 * graph.det_has_depth.astype(dtype)
    r = jnp.concatenate([res01, res2[..., None]], -1)   # (F, D, D, 3)

    # d rel / d (ta, ya, tb): (all (F, D, D, 3, 4) folded analytically)
    # d rel/d tb = R(-ya); d rel/d ta = -R(-ya)
    # d rel/d ya = [rel_y, -rel_x, 0]
    Rm = jnp.stack([
        jnp.stack([c + 0 * relx, s + 0 * relx, 0 * relx], -1),
        jnp.stack([-s + 0 * relx, c + 0 * relx, 0 * relx], -1),
        jnp.stack([0 * relx, 0 * relx, 1 + 0 * relx], -1),
    ], -2)                                              # (F, D, D, 3, 3)
    drel_dya = jnp.stack([rely, -relx, 0 * relx], -1)   # (F, D, D, 3)

    # d unit/d rel = (I - unit unit^T)/n ; d res01/d rel = TB @ that /σs
    # d res2/d rel = unit/(n^2 σi)
    P = (jnp.eye(3, dtype=dtype) - unit[..., :, None] * unit[..., None, :]) \
        / n[..., None, None]
    dres01_drel = jnp.einsum("fabkj,fabji->fabki", graph.det_tb, P) / sphere_std
    dres2_drel = (unit / (n * n)[..., None]) / inv_dep_std \
        * graph.det_has_depth.astype(dtype)[..., None]
    dres_drel = jnp.concatenate(
        [dres01_drel, dres2_drel[..., None, :]], -2)    # (F, D, D, 3, 3)

    # chain: Jb = dres_drel @ R(-ya); Ja_t = -Jb_t; Ja_yaw = dres_drel @ drel_dya
    J_t_b = jnp.einsum("fabki,fabij->fabkj", dres_drel, Rm)  # (F,D,D,3,3)
    J_yaw_a = jnp.einsum("fabki,fabi->fabk", dres_drel, drel_dya)
    Ja = jnp.concatenate([-J_t_b, J_yaw_a[..., None]], -1)   # (F,D,D,3,4)
    Jb = jnp.concatenate([J_t_b, jnp.zeros_like(J_yaw_a)[..., None]], -1)

    norm = jnp.linalg.norm(r, axis=-1)
    w = jnp.where(norm <= huber_delta, 1.0,
                  huber_delta / jnp.maximum(norm, 1e-12))
    w = w * graph.det_valid.astype(dtype)
    cost = 0.5 * jnp.sum(jnp.where(graph.det_valid,
                                   fx.huber_rho(norm * norm, huber_delta),
                                   0.0))
    return r, Ja, Jb, w, cost


# ---------------------------------------------------------------------------
# Assembly
# ---------------------------------------------------------------------------

def _param_mask_dense(graph: DenseGraph, dtype) -> jnp.ndarray:
    free = graph.pose_valid & ~graph.pose_fixed
    m = jnp.repeat(free[..., None], 4, -1)
    m = m.at[..., 3].set(m[..., 3] & ~graph.yaw_fixed)
    return m.reshape(-1).astype(dtype)



def _relpose_terms_analytic(pa, pb, dpose_meas, sqrt_info):
    """Batched analytic residual + Jacobians for 4-DoF relpose factors.

    Same closed form as the odometry chain (_odom_terms) generalized to a
    full (4, 4) sqrt information: e = meas - delta(a, b), r = S e,
    J = S @ (∂e/∂pose). Replaces the vmapped jacfwd evaluation.
    Shapes: pa/pb/dpose (L, 4), sqrt_info (L, 4, 4) → r (L, 4),
    Ja/Jb (L, 4, 4).
    """
    delta = geo.delta_pose(pa, pb)
    e = dpose_meas - delta
    e = e.at[..., 3].set(geo.normalize_angle(e[..., 3]))
    r = jnp.einsum("kij,kj->ki", sqrt_info, e)

    c = jnp.cos(pa[..., 3])
    sn = jnp.sin(pa[..., 3])
    zero = jnp.zeros_like(c)
    one = jnp.ones_like(c)
    dx_, dy_ = delta[..., 0], delta[..., 1]
    Ua = jnp.stack([
        jnp.stack([c, sn, zero, -dy_], -1),
        jnp.stack([-sn, c, zero, dx_], -1),
        jnp.stack([zero, zero, one, zero], -1),
        jnp.stack([zero, zero, zero, one], -1),
    ], -2)
    Ub = jnp.stack([
        jnp.stack([-c, -sn, zero, zero], -1),
        jnp.stack([sn, -c, zero, zero], -1),
        jnp.stack([zero, zero, -one, zero], -1),
        jnp.stack([zero, zero, zero, -one], -1),
    ], -2)
    Ja = jnp.einsum("kij,kjl->kil", sqrt_info, Ua)
    Jb = jnp.einsum("kij,kjl->kil", sqrt_info, Ub)
    return r, Ja, Jb


def assemble_dense(graph: DenseGraph, poses: jnp.ndarray, *,
                   huber_delta: float = 1.0, det_sphere_std: float = 0.1,
                   det_inv_dep_std: float = 0.5,
                   axis_name: Optional[str] = None):
    """Dense (scatter-free except loops) normal equations. Returns (H, g, cost)."""
    F, D = graph.pose_valid.shape
    dtype = poses.dtype
    N = F * D
    P = 4 * N

    # --- intra-frame dense blocks, layout (F, Da, Db, 4, 4) ------------
    intra = jnp.zeros((F, D, D, 4, 4), dtype)
    diag = jnp.zeros((F, D, 4, 4), dtype)               # per-pose diagonal
    gvec = jnp.zeros((F, D, 4), dtype)

    if graph.ant_pos is None:
        # ranges: Ja = si*u on pose a translation; antisymmetric pair
        # structure. block B = su su^T (3x3, pad yaw) ; weight w
        r_r, su, w_r, cost = _range_terms(graph, poses, huber_delta)
        B3 = su[..., :, None] * su[..., None, :]        # (F, D, D, 3, 3)
        wB3 = B3 * w_r[..., None, None]
        # valid grid is a<b only; accumulate both orientations explicitly
        # (uu^T identical for both).
        wB3_sym = wB3 + jnp.swapaxes(wB3, 1, 2)
        diag = diag.at[..., :3, :3].add(jnp.sum(wB3_sym, axis=2))
        intra = intra.at[..., :3, :3].add(-wB3_sym)
        # gradient: ga += w si*u * r ; gb -= ...
        gr = (su * (w_r * r_r)[..., None])              # (F, D, D, 3)
        gvec = gvec.at[..., :3].add(
            jnp.sum(gr - jnp.swapaxes(gr, 1, 2), axis=2))
    else:
        # antenna offsets break the antisymmetry (ka != kb): general 4-wide
        # accumulation, same shape conventions as the detection family.
        r_r, ja4, jb4, w_r, cost = _range_terms_ant(graph, poses, huber_delta)
        wja4 = ja4 * w_r[..., None]
        wjb4 = jb4 * w_r[..., None]
        diag += jnp.sum(jnp.einsum("fabi,fabj->fabij", wja4, ja4), axis=2)
        diag += jnp.sum(jnp.einsum("fabi,fabj->fabij", wjb4, jb4), axis=1)
        Bab_r = jnp.einsum("fabi,fabj->fabij", wja4, jb4)
        intra += Bab_r
        intra += jnp.swapaxes(jnp.swapaxes(Bab_r, -1, -2), 1, 2)
        gvec += jnp.sum(wja4 * r_r[..., None], axis=2)
        gvec += jnp.sum(wjb4 * r_r[..., None], axis=1)

    # detections (det grids are None when the window has none — see
    # assemble_blocks)
    if graph.det_dir is not None:
        r_d, Ja_d, Jb_d, w_d, cost_d = _det_terms(
            graph, poses, huber_delta, det_sphere_std, det_inv_dep_std)
        cost += cost_d
        wJa = Ja_d * w_d[..., None, None]
        wJb = Jb_d * w_d[..., None, None]
        diag += jnp.sum(jnp.einsum("fabki,fabkj->fabij", wJa, Ja_d), axis=2)
        diag += jnp.sum(jnp.einsum("fabki,fabkj->fabij", wJb, Jb_d), axis=1)
        Bab = jnp.einsum("fabki,fabkj->fabij", wJa, Jb_d)
        intra += Bab
        intra += jnp.swapaxes(jnp.swapaxes(Bab, -1, -2), 1, 2)
        gvec += jnp.sum(jnp.einsum("fabki,fabk->fabi", wJa, r_d), axis=2)
        gvec += jnp.sum(jnp.einsum("fabki,fabk->fabi", wJb, r_d), axis=1)

    # --- odometry chain: diag at f and f+1, off-diag (f, f+1) ----------
    r_o, Ja_o, Jb_o, w_o, cost_o = _odom_terms(graph, poses, F)
    cost += cost_o
    wJa_o = Ja_o * w_o[..., None, None]
    wJb_o = Jb_o * w_o[..., None, None]
    Baa_o = jnp.einsum("fdki,fdkj->fdij", wJa_o, Ja_o)
    Bbb_o = jnp.einsum("fdki,fdkj->fdij", wJb_o, Jb_o)
    Bab_o = jnp.einsum("fdki,fdkj->fdij", wJa_o, Jb_o)
    diag = diag.at[:-1].add(Baa_o)
    diag = diag.at[1:].add(Bbb_o)
    gvec = gvec.at[:-1].add(jnp.einsum("fdki,fdk->fdi", wJa_o, r_o))
    gvec = gvec.at[1:].add(jnp.einsum("fdki,fdk->fdi", wJb_o, r_o))

    # --- build the big H with eye-einsums (scatter-free) ---------------
    # node layout: node = f*D + d, params [4*node, 4*node+4)
    eye_f = jnp.eye(F, dtype=dtype)
    eye_d = jnp.eye(D, dtype=dtype)
    # fold the per-pose diagonal into the intra-frame grid's a==b blocks
    intra = intra + jnp.einsum("fdij,de->fdeij", diag, eye_d)
    # frame-block-diagonal embedding: H[f,a,i,g,b,j] += δ_fg intra[f,a,b,i,j]
    H6 = jnp.einsum("fabij,fg->faigbj", intra, eye_f)
    # odometry off-diagonal (f,d) ↔ (f+1,d): shifted-eye embedding
    shift = jnp.eye(F, k=1, dtype=dtype)                # shift[f, f+1] = 1
    Bab_pad = jnp.concatenate(
        [Bab_o, jnp.zeros((1, D, 4, 4), dtype)], axis=0)  # (F, D, 4, 4)
    H6 += jnp.einsum("fdij,fg,de->fdigej", Bab_pad, shift, eye_d)
    H6 += jnp.einsum("fdij,fg,de->gejfdi", Bab_pad, shift, eye_d)

    Hb = H6.reshape(N, 4, N, 4).transpose(0, 2, 1, 3)   # (N, N, 4, 4)

    # --- sparse loops (small scatter) ----------------------------------
    l = graph.loops
    pa = poses.reshape(N, 4)[l.frame_a * D + l.drone_a]
    pb = poses.reshape(N, 4)[l.frame_b * D + l.drone_b]
    ev = fx.relpose_eval(pa, pb, l.dpose, l.sqrt_info)
    w_l = fx.huber_weight(ev.residual, huber_delta)
    cost += 0.5 * jnp.sum(jnp.where(
        l.valid, fx.huber_rho(jnp.sum(ev.residual**2, -1), huber_delta), 0.0))
    ws = jnp.sqrt(w_l) * l.valid.astype(dtype)
    ja = ev.jac_a * ws[:, None, None]
    jb = ev.jac_b * ws[:, None, None]
    rl = ev.residual * ws[:, None]
    na = l.frame_a * D + l.drone_a
    nb = l.frame_b * D + l.drone_b
    idxl = jnp.concatenate([na * N + na, nb * N + nb, na * N + nb,
                            nb * N + na])
    Babl = jnp.einsum("kmi,kmj->kij", ja, jb)
    blkl = jnp.concatenate([
        jnp.einsum("kmi,kmj->kij", ja, ja).reshape(-1, 16),
        jnp.einsum("kmi,kmj->kij", jb, jb).reshape(-1, 16),
        Babl.reshape(-1, 16),
        jnp.swapaxes(Babl, -1, -2).reshape(-1, 16)])
    Hb = (Hb.reshape(N * N, 16).at[idxl].add(blkl)).reshape(N, N, 4, 4)
    gflat = gvec.reshape(N, 4)
    gflat = gflat.at[na].add(jnp.einsum("kmi,km->ki", ja, rl))
    gflat = gflat.at[nb].add(jnp.einsum("kmi,km->ki", jb, rl))

    H = Hb.transpose(0, 2, 1, 3).reshape(P, P)
    g = gflat.reshape(P)

    if axis_name is not None:
        H = jax.lax.psum(H, axis_name)
        g = jax.lax.psum(g, axis_name)
        cost = jax.lax.psum(cost, axis_name)

    m = _param_mask_dense(graph, dtype)
    H = H * m[:, None] * m[None, :] + jnp.diag(1.0 - m)
    g = g * m
    return H, g, cost


# ---------------------------------------------------------------------------
# Solve + conversion
# ---------------------------------------------------------------------------

def lm_solve_dense_impl(graph: DenseGraph, poses0: jnp.ndarray, *,
                        max_iterations: int = 100, huber_delta: float = 1.0,
                        det_sphere_std: float = 0.1,
                        det_inv_dep_std: float = 0.5,
                        function_tolerance: float = 1e-6,
                        axis_name: Optional[str] = None):
    from omniswarm_tpu.solver.gauss_newton import run_lm_loop

    assemble = functools.partial(
        assemble_dense, graph, huber_delta=huber_delta,
        det_sphere_std=det_sphere_std, det_inv_dep_std=det_inv_dep_std,
        axis_name=axis_name)
    return run_lm_loop(assemble, poses0, max_iterations=max_iterations,
                       function_tolerance=function_tolerance)


lm_solve_dense = jax.jit(
    lm_solve_dense_impl,
    static_argnames=("max_iterations", "huber_delta", "det_sphere_std",
                     "det_inv_dep_std", "function_tolerance", "axis_name"),
)


def dense_graph_from_sim(sim_data, *, distance_cov: float = 0.02,
                         vo_cov_pos_per_meter: float = 0.002,
                         vo_cov_yaw_per_meter: float = 0.0001,
                         self_id: int = 0,
                         enable_detections: bool = True,
                         loops_override=None,
                         max_loops: Optional[int] = None,
                         ant_pos=None) -> DenseGraph:
    """Build a DenseGraph directly from sim.SimData (no scatter lists).

    Host-side construction is pure numpy: the returned DenseGraph carries
    numpy leaves so the device sees ONE transfer (device_put / jit call),
    not one eager dispatch per field — over the remote-TPU tunnel the
    eager-per-field version took ~36 s at F=1024.
    """
    import numpy as np

    from omniswarm_tpu.sim.simulator import delta_pose_np

    F, D = sim_data.gt.shape[:2]
    loops_src = loops_override if loops_override is not None \
        else sim_data.loops
    L = max_loops or max(8, len(loops_src))

    # ranges (a < b half)
    tri = np.triu(np.ones((D, D), bool), 1)
    range_valid = np.asarray(sim_data.range_valid) & tri[None]

    # odometry from VIO deltas (vectorized over the frame axis)
    vio = np.asarray(sim_data.vio)
    d = delta_pose_np(vio[:-1], vio[1:]).astype(np.float32)  # (F-1, D, 4)
    seg = np.maximum(np.linalg.norm(d[..., :3], axis=-1), 1e-3)
    si = np.empty((F - 1, D, 4), np.float32)
    si[..., :3] = (1.0 / np.sqrt(vo_cov_pos_per_meter * seg))[..., None]
    si[..., 3] = 1.0 / np.sqrt(vo_cov_yaw_per_meter * seg)

    # detections (same frame, a sees b) — tangent bases in one batched call
    det_dir = np.zeros((F, D, D, 3), np.float32)
    det_tb = np.zeros((F, D, D, 2, 3), np.float32)
    det_invdep = np.zeros((F, D, D), np.float32)
    det_valid = np.zeros((F, D, D), bool)
    if enable_detections and sim_data.detections:
        from omniswarm_tpu.core import geometry as geo_mod
        dets = sim_data.detections
        fab = np.asarray([(dd.frame, dd.drone_a, dd.drone_b) for dd in dets])
        dirs = np.asarray([dd.direction for dd in dets], np.float32)
        tbs = geo_mod.tangent_base_from_unit_np(dirs)
        det_dir[fab[:, 0], fab[:, 1], fab[:, 2]] = dirs
        det_tb[fab[:, 0], fab[:, 1], fab[:, 2]] = tbs
        det_invdep[fab[:, 0], fab[:, 1], fab[:, 2]] = [
            dd.inv_dep for dd in dets]
        det_valid[fab[:, 0], fab[:, 1], fab[:, 2]] = True

    # loops (numpy struct-of-arrays)
    lfa = np.zeros(L, np.int32)
    lda = np.zeros(L, np.int32)
    lfb = np.zeros(L, np.int32)
    ldb = np.zeros(L, np.int32)
    ldp = np.zeros((L, 4), np.float32)
    lsi = np.zeros((L, 4, 4), np.float32)
    lv = np.zeros(L, bool)
    for i, lp in enumerate(loops_src):
        lfa[i], lda[i], lfb[i], ldb[i] = (lp.frame_a, lp.drone_a,
                                          lp.frame_b, lp.drone_b)
        ldp[i] = lp.dpose
        lsi[i] = np.diag([1.0 / lp.pos_std] * 3 + [1.0 / lp.yaw_std])
        lv[i] = True

    pose_valid = np.ones((F, D), bool)
    pose_fixed = np.zeros((F, D), bool)
    pose_fixed[0, self_id] = True

    return DenseGraph(
        range_dist=np.asarray(sim_data.ranges, np.float32),
        range_valid=range_valid,
        range_sqrt_inf=np.float32(1.0 / np.sqrt(distance_cov)),
        odom_dpose=d, odom_sqrt_info=si,
        odom_valid=np.ones((F - 1, D), bool),
        det_dir=det_dir, det_tb=det_tb, det_invdep=det_invdep,
        det_valid=det_valid, det_has_depth=det_valid,
        loops=RelPoseFactors(lfa, lda, lfb, ldb, ldp, lsi, lv),
        pose_valid=pose_valid, pose_fixed=pose_fixed,
        yaw_fixed=np.zeros((F, D), bool),
        ant_pos=None if ant_pos is None
        else np.asarray(ant_pos, np.float32),
    )


def lm_solve_dense_batched_impl(graph: DenseGraph, poses0_batch: jnp.ndarray,
                                *, max_iterations: int = 100,
                                huber_delta: float = 1.0,
                                det_sphere_std: float = 0.1,
                                det_inv_dep_std: float = 0.5,
                                function_tolerance: float = 1e-6):
    """Batch-native LM: B problem instances advance in lock-step.

    One while_loop carries (B, ...) state; assembly is vmapped and the B
    damped systems are factorized by one batched Cholesky — the TPU-natural
    way to run multi-init trials or per-drone replica solves concurrently.
    Lanes that have converged simply stop accepting steps (their lambda
    freezes); the loop exits when all lanes are done or at max_iterations.
    """
    import jax.scipy.linalg as jsl

    from omniswarm_tpu.solver.gauss_newton import SolveResult, _apply_step

    assemble_one = functools.partial(
        assemble_dense, graph, huber_delta=huber_delta,
        det_sphere_std=det_sphere_std, det_inv_dep_std=det_inv_dep_std)
    assemble = jax.vmap(assemble_one)

    H0, g0, cost0 = assemble(poses0_batch)
    B = poses0_batch.shape[0]

    def cond(state):
        _, _, _, _, _, it, done = state
        return (~jnp.all(done)) & (it < max_iterations)

    def body(state):
        poses, H, g, cost, lam, it, done = state
        diag = jnp.maximum(
            jnp.diagonal(H, axis1=-2, axis2=-1), 1e-6)      # (B, P)
        Hd = H + lam[:, None, None] * jax.vmap(jnp.diag)(diag)
        L = jax.lax.linalg.cholesky(Hd)
        dx = jsl.cho_solve((L, True), -g[..., None])[..., 0]
        bad = ~jnp.all(jnp.isfinite(dx), axis=-1)            # (B,)
        dx = jnp.where(bad[:, None], 0.0, dx)
        new_poses = jax.vmap(_apply_step)(poses, dx)
        Hn, gn, new_cost = assemble(new_poses)
        accept = jnp.isfinite(new_cost) & (new_cost < cost) & ~bad & ~done
        sel = accept[:, None, None, None]
        poses = jnp.where(sel, new_poses, poses)
        H = jnp.where(accept[:, None, None], Hn, H)
        g = jnp.where(accept[:, None], gn, g)
        out_cost = jnp.where(accept, new_cost, cost)
        lam = jnp.where(done, lam, jnp.clip(
            jnp.where(accept, lam * 0.3, lam * 5.0), 1e-10, 1e10))
        converged = accept & (cost - new_cost <= function_tolerance * cost)
        stalled = (~accept) & (lam >= 1e9)
        return (poses, H, g, out_cost, lam, it + 1,
                done | converged | stalled)

    state0 = (poses0_batch, H0, g0, cost0,
              jnp.full((B,), 1e-4, poses0_batch.dtype),
              jnp.zeros((), jnp.int32), jnp.zeros((B,), bool))
    poses, _, _, cost, lam, it, _ = jax.lax.while_loop(cond, body, state0)
    return SolveResult(poses=poses, cost=cost, initial_cost=cost0,
                       iterations=it, lam=lam)


lm_solve_dense_batched = jax.jit(
    lm_solve_dense_batched_impl,
    static_argnames=("max_iterations", "huber_delta", "det_sphere_std",
                     "det_inv_dep_std", "function_tolerance"),
)


# ---------------------------------------------------------------------------
# Block-tridiagonal + Woodbury path (no (P, P) Hessian ever materialized)
# ---------------------------------------------------------------------------

def assemble_blocks(graph: DenseGraph, poses: jnp.ndarray, *,
                    huber_delta: float = 1.0, det_sphere_std: float = 0.1,
                    det_inv_dep_std: float = 0.5, loops_dense: bool = True):
    """Normal equations in frame-block form — F-minor (lane-major) layout.

    Returns (A (F, m, m) diagonal blocks, Boff (F-1, m, m) odometry
    off-diagonals, g (F, m), U (F, m, 4L) loop Jacobian columns, cost) with
    m = D*4. The full Hessian is implicitly T + U U^T where T is
    block-tridiagonal — solved by cyclic reduction + Sherman-Morrison-
    Woodbury in lm_solve_bt. Numerically identical to assemble_dense's big
    H (tested).

    Layout note: every intermediate is shaped (..., F) with the long frame
    axis minor — the TPU vector-lane axis. The tiny 4x4/3x4 block indices
    live on outer axes, so J^T J products are pure f32 VPU multiply-adds
    (no bf16 micro-dots) and the a<->b pair swap is an outer-axis transpose
    of whole lane rows. Measured 6x faster than the F-major einsum form on
    v5e, and bit-accurate (the einsum form loses ~1e-3 to reduced-precision
    dot passes). One final transpose delivers bt_solve's (F, m, m) layout.
    """
    F, D = graph.pose_valid.shape
    m = 4 * D
    dtype = poses.dtype
    delta = huber_delta

    p = poses.transpose(2, 1, 0)                         # (4, D, F)
    t = p[:3]                                            # (3, D, F)
    ya = p[3]                                            # (D, F)

    # --- UWB ranges: pair grid (i, j, Da, Db, F) ------------------------
    diff = t[:, :, None, :] - t[:, None, :, :]           # (3, Da, Db, F)
    si = jnp.asarray(graph.range_sqrt_inf, dtype)
    if si.ndim:
        si = si.transpose(1, 2, 0)
    rvalid = graph.range_valid.transpose(1, 2, 0)
    if graph.ant_pos is None:
        diffr = diff
    else:
        # range between antenna phase centers t + R(yaw) ant
        # (anntena_pos, swarm_localization_node.cpp:300-328)
        ant = jnp.asarray(graph.ant_pos, dtype)          # (D, 3)
        ca_ = jnp.cos(ya)                                # (D, F)
        sa_ = jnp.sin(ya)
        rot = jnp.stack([ca_ * ant[:, 0, None] - sa_ * ant[:, 1, None],
                         sa_ * ant[:, 0, None] + ca_ * ant[:, 1, None],
                         jnp.broadcast_to(ant[:, 2, None], ya.shape)], 0)
        teff = t + rot                                   # (3, D, F)
        diffr = teff[:, :, None, :] - teff[:, None, :, :]
    dist = jnp.sqrt(jnp.sum(diffr * diffr, 0) + 1e-12)   # (Da, Db, F)
    r_r = (dist - graph.range_dist.transpose(1, 2, 0)) * si
    u_r = diffr / dist[None]
    w_r = jnp.where(jnp.abs(r_r) <= delta, 1.0,
                    delta / jnp.maximum(jnp.abs(r_r), 1e-12))
    w_r = w_r * rvalid.astype(dtype)
    cost = 0.5 * jnp.sum(jnp.where(rvalid,
                                   fx.huber_rho(r_r * r_r, delta), 0.0))

    Hp = jnp.zeros((4, 4, D, D, F), dtype)               # (ia, jb, Da, Db, F)
    diag = jnp.zeros((4, 4, D, F), dtype)
    g = jnp.zeros((4, D, F), dtype)

    if graph.ant_pos is None:
        su = u_r * si
        wB = su[:, None] * su[None, :] * w_r[None, None]  # (3, 3, Da, Db, F)
        wB_sym = wB + wB.transpose(0, 1, 3, 2, 4)
        Hp = Hp.at[:3, :3].add(-wB_sym)
        diag = diag.at[:3, :3].add(jnp.sum(wB_sym, axis=3))
        gr = su * (w_r * r_r)[None]
        g = g.at[:3].add(jnp.sum(gr - gr.transpose(0, 2, 1, 3), axis=2))
    else:
        # ka != kb breaks the antisymmetric shortcut: general 4-row form
        dRr = jnp.stack([-sa_ * ant[:, 0, None] - ca_ * ant[:, 1, None],
                         ca_ * ant[:, 0, None] - sa_ * ant[:, 1, None],
                         jnp.zeros_like(ya)], 0)         # (3, D, F)
        ka = jnp.sum(u_r * dRr[:, :, None, :], 0)        # (Da, Db, F)
        kb = jnp.sum(u_r * dRr[:, None, :, :], 0)
        ja_r = jnp.concatenate([u_r, ka[None]], 0) * si  # (4, Da, Db, F)
        jb_r = -jnp.concatenate([u_r, kb[None]], 0) * si
        wja_r = ja_r * w_r[None]
        wjb_r = jb_r * w_r[None]
        diag += jnp.sum(wja_r[:, None] * ja_r[None, :], axis=3)
        diag += jnp.sum(wjb_r[:, None] * jb_r[None, :], axis=2)
        cross_r = wja_r[:, None] * jb_r[None, :]         # (ia, jb, Da, Db, F)
        Hp += cross_r + cross_r.transpose(1, 0, 3, 2, 4)
        g += jnp.sum(wja_r * r_r[None], axis=2)
        g += jnp.sum(wjb_r * r_r[None], axis=1)

    # --- detections: bearing + inverse depth ----------------------------
    # det grids are None when the window carries no detections — the
    # (F, D, D, ...) grids were >half the graph upload at F=1024 (a ~1 MB
    # per-solve transfer over a ~30 MB/s tunnel) and the term math is
    # dead weight; None is a static pytree difference, so each mode
    # compiles once
    if graph.det_dir is not None:
        ddir = graph.det_dir.transpose(3, 1, 2, 0)       # (3, Da, Db, F)
        dtb = graph.det_tb.transpose(3, 4, 1, 2, 0)      # (2, 3, Da, Db, F)
        dinv = graph.det_invdep.transpose(1, 2, 0)
        dvalid = graph.det_valid.transpose(1, 2, 0)
        dhas = graph.det_has_depth.transpose(1, 2, 0).astype(dtype)
        c = jnp.cos(ya)[:, None, :]                      # (Da, 1, F)
        s = jnp.sin(ya)[:, None, :]
        diffb = -diff                                    # b - a
        relx = c * diffb[0] + s * diffb[1]
        rely = -s * diffb[0] + c * diffb[1]
        rel = jnp.stack([relx, rely, diffb[2]], 0)       # (3, Da, Db, F)
        n = jnp.sqrt(jnp.sum(rel * rel, 0) + 1e-12)
        unit = rel / n[None]
        err3 = unit - ddir
        res01 = jnp.sum(dtb * err3[None], axis=1) / det_sphere_std
        res2 = (dinv - 1.0 / n) / det_inv_dep_std * dhas
        rd = jnp.concatenate([res01, res2[None]], 0)     # (3k, Da, Db, F)
        P = (jnp.eye(3, dtype=dtype)[:, :, None, None, None]
             - unit[:, None] * unit[None, :]) / n[None, None]
        dres01 = jnp.sum(dtb[:, :, None] * P[None], axis=1) / det_sphere_std
        dres2 = unit / (n * n)[None] / det_inv_dep_std * dhas[None]
        dres = jnp.concatenate([dres01, dres2[None]], 0)  # (3k,3i,Da,Db,F)
        Jb0 = dres[:, 0] * c + dres[:, 1] * (-s)     # chain through R(-ya)
        Jb1 = dres[:, 0] * s + dres[:, 1] * c
        Jb2 = dres[:, 2]
        drel_dya = jnp.stack([rely, -relx, jnp.zeros_like(relx)], 0)
        Jya = jnp.sum(dres * drel_dya[None, :], axis=1)  # (3k, Da, Db, F)
        Jb_d = jnp.stack([Jb0, Jb1, Jb2, jnp.zeros_like(Jb0)], 1)
        Ja_d = jnp.stack([-Jb0, -Jb1, -Jb2, Jya], 1)     # (k,4i,Da,Db,F)
        normd = jnp.sqrt(jnp.sum(rd * rd, 0) + 1e-20)
        w_d = jnp.where(normd <= delta, 1.0,
                        delta / jnp.maximum(normd, 1e-12))
        w_d = w_d * dvalid.astype(dtype)
        cost += 0.5 * jnp.sum(jnp.where(
            dvalid, fx.huber_rho(normd * normd, delta), 0.0))
        wJa = Ja_d * w_d[None, None]
        wJb = Jb_d * w_d[None, None]
        jtj = lambda X, Y: jnp.sum(X[:, :, None] * Y[:, None, :], axis=0)
        diag += jnp.sum(jtj(wJa, Ja_d), axis=3)          # at a (sum Db)
        diag += jnp.sum(jtj(wJb, Jb_d), axis=2)          # at b (sum Da)
        Bab = jtj(wJa, Jb_d)                             # (ia,jb,Da,Db,F)
        Hp += Bab + Bab.transpose(1, 0, 3, 2, 4)
        g += jnp.sum(jnp.sum(wJa * rd[:, None], 0), axis=2)
        g += jnp.sum(jnp.sum(wJb * rd[:, None], 0), axis=1)

    # --- ego-motion chain (frame axis F-1, still minor) ------------------
    om = graph.odom_dpose.transpose(2, 1, 0)             # (4, D, F-1)
    osi = graph.odom_sqrt_info.transpose(2, 1, 0)
    ovalid = graph.odom_valid.transpose(1, 0).astype(dtype)  # (D, F-1)
    ta, tb = t[..., :-1], t[..., 1:]
    yaa, yab = ya[..., :-1], ya[..., 1:]
    co = jnp.cos(yaa)
    so = jnp.sin(yaa)
    dxw = tb[0] - ta[0]
    dyw = tb[1] - ta[1]
    dx_ = co * dxw + so * dyw
    dy_ = -so * dxw + co * dyw
    dz_ = tb[2] - ta[2]
    dyaw = geo.normalize_angle(yab - yaa)
    e = jnp.stack([om[0] - dx_, om[1] - dy_, om[2] - dz_,
                   geo.normalize_angle(om[3] - dyaw)], 0)  # (4, D, F-1)
    r_o = osi * e
    cost += 0.5 * jnp.sum(ovalid * jnp.sum(r_o * r_o, 0))
    zo = jnp.zeros_like(co)
    one = jnp.ones_like(co)
    # rows k, cols i; scaled by osi[k]
    Ja_o = jnp.stack([
        jnp.stack([co, so, zo, -dy_], 0),
        jnp.stack([-so, co, zo, dx_], 0),
        jnp.stack([zo, zo, one, zo], 0),
        jnp.stack([zo, zo, zo, one], 0),
    ], 0) * osi[:, None]                                 # (4k, 4i, D, F-1)
    Jb_o = jnp.stack([
        jnp.stack([-co, -so, zo, zo], 0),
        jnp.stack([so, -co, zo, zo], 0),
        jnp.stack([zo, zo, -one, zo], 0),
        jnp.stack([zo, zo, zo, -one], 0),
    ], 0) * osi[:, None]
    wJa_o = Ja_o * ovalid[None, None]
    wJb_o = Jb_o * ovalid[None, None]
    jtj2 = lambda X, Y: jnp.sum(X[:, :, None] * Y[:, None, :], axis=0)
    diag = diag.at[..., :-1].add(jtj2(wJa_o, Ja_o))
    diag = diag.at[..., 1:].add(jtj2(wJb_o, Jb_o))
    Bab_o = jtj2(wJa_o, Jb_o)                            # (ia, jb, D, F-1)
    g = g.at[..., :-1].add(jnp.sum(wJa_o * r_o[:, None], 0))
    g = g.at[..., 1:].add(jnp.sum(wJb_o * r_o[:, None], 0))

    # param mask at (F, D, 4) granularity
    free = graph.pose_valid & ~graph.pose_fixed
    mask4 = jnp.repeat(free[..., None], 4, -1)
    mask4 = mask4.at[..., 3].set(mask4[..., 3] & ~graph.yaw_fixed)
    mflat = mask4.reshape(F, m).astype(dtype)            # (F, m)

    # embed per-pose diag on a==b, then one transpose to (F, m, m)
    ii = jnp.arange(D)
    Hp = Hp.at[:, :, ii, ii, :].add(diag)
    A = Hp.transpose(4, 2, 0, 3, 1).reshape(F, m, m)
    gvec = g.transpose(2, 1, 0)                          # (F, D, 4)

    # odometry off-diagonal frame blocks (block-diagonal over drones)
    Bp = jnp.zeros((4, 4, D, D, F - 1), dtype)
    Bp = Bp.at[:, :, ii, ii, :].set(Bab_o)
    Boff = Bp.transpose(4, 2, 0, 3, 1).reshape(F - 1, m, m)

    # sparse loop factors → low-rank columns U (F, m, 4L) + g additions
    l = graph.loops
    L = l.valid.shape[0]
    N = F * D
    poses_flat = poses.reshape(N, 4)
    pa = poses_flat[l.frame_a * D + l.drone_a]
    pb = poses_flat[l.frame_b * D + l.drone_b]
    r_l, Ja_l, Jb_l = _relpose_terms_analytic(pa, pb, l.dpose, l.sqrt_info)
    w_l = fx.huber_weight(r_l, huber_delta)
    cost += 0.5 * jnp.sum(jnp.where(
        l.valid, fx.huber_rho(jnp.sum(r_l**2, -1), huber_delta), 0.0))
    ws = jnp.sqrt(w_l) * l.valid.astype(dtype)
    ja = Ja_l * ws[:, None, None]                        # (L, 4, 4) rows m
    jb = Jb_l * ws[:, None, None]
    rl = r_l * ws[:, None]

    gflat = gvec.reshape(F, m)
    gl = jnp.zeros((F * m,), dtype)
    grow_a = (l.frame_a[:, None] * m + l.drone_a[:, None] * 4
              + jnp.arange(4)[None, :])
    grow_b = (l.frame_b[:, None] * m + l.drone_b[:, None] * 4
              + jnp.arange(4)[None, :])
    gl = gl.at[grow_a.reshape(-1)].add(
        jnp.einsum("kmi,km->ki", ja, rl).reshape(-1))
    gl = gl.at[grow_b.reshape(-1)].add(
        jnp.einsum("kmi,km->ki", jb, rl).reshape(-1))
    gflat = gflat + gl.reshape(F, m)

    # apply masks: zero rows/cols, unit diagonal on masked entries
    A = A * mflat[:, :, None] * mflat[:, None, :]
    A = A + jnp.eye(m, dtype=dtype)[None] * (1.0 - mflat)[:, :, None] * \
        jnp.eye(m, dtype=dtype)[None]
    Boff = Boff * mflat[:-1, :, None] * mflat[1:, None, :]
    gflat = gflat * mflat

    if not loops_dense:
        # sparse loop form for the large-L PCG path: weighted Jacobian
        # blocks + flat row indices. Building/sweeping the dense
        # (F, m, 4L) U and the (4L, 4L) capacitance is O(F·m·L + L^3) —
        # at 2k loops the capacitance Newton-Schulz alone is ~100 ms/LM
        # iteration on v5e; the sparse form is O(L) per matvec.
        ma = mflat.reshape(-1)[grow_a]                   # (L, 4) param mask
        mb = mflat.reshape(-1)[grow_b]
        ja_s = ja * ma[:, None, :]
        jb_s = jb * mb[:, None, :]
        diagU = jnp.zeros((F * m,), dtype)
        diagU = diagU.at[grow_a.reshape(-1)].add(
            jnp.sum(ja_s * ja_s, axis=1).reshape(-1))
        diagU = diagU.at[grow_b.reshape(-1)].add(
            jnp.sum(jb_s * jb_s, axis=1).reshape(-1))
        sparse = SparseLoops(ja=ja_s, jb=jb_s, rows_a=grow_a,
                             rows_b=grow_b, diag=diagU.reshape(F, m))
        return A, Boff, gflat, sparse, cost

    # U[f, d*4+i, 4k+c] += J^T entries for each loop endpoint
    U = jnp.zeros((F * m, 4 * L), dtype)
    col = (jnp.arange(L)[:, None, None] * 4
           + jnp.arange(4)[None, :, None])               # (L, 4c, 1)
    col = jnp.broadcast_to(col, (L, 4, 4))
    row_a = (l.frame_a[:, None, None] * m + l.drone_a[:, None, None] * 4
             + jnp.arange(4)[None, None, :])             # (L, 1, 4i)
    row_a = jnp.broadcast_to(row_a, (L, 4, 4))
    row_b = (l.frame_b[:, None, None] * m + l.drone_b[:, None, None] * 4
             + jnp.arange(4)[None, None, :])
    row_b = jnp.broadcast_to(row_b, (L, 4, 4))
    # ja[k, c, i] goes to U[row_a[k, c, i], col[k, c, i]]
    U = U.at[row_a.reshape(-1), col.reshape(-1)].add(ja.reshape(-1))
    U = U.at[row_b.reshape(-1), col.reshape(-1)].add(jb.reshape(-1))
    U = U.reshape(F, m, 4 * L)
    U = U * mflat[:, :, None]

    return A, Boff, gflat, U, cost


class SparseLoops(NamedTuple):
    """Loop factors in sparse endpoint-block form (the large-L linear
    path). ja/jb: (L, 4, 4) weighted Jacobian blocks (residual row,
    param col), rows_a/rows_b: (L, 4) flat row indices into the (F*m,)
    state, diag: (F, m) Gauss-Newton diagonal of the loop term."""

    ja: jnp.ndarray
    jb: jnp.ndarray
    rows_a: jnp.ndarray
    rows_b: jnp.ndarray
    diag: jnp.ndarray


@highp
def _pcg_solve_core(A, Boff, g, sl: SparseLoops, lam, warm=None, *,
                    pack: int = 1, fused_levels: bool = False,
                    cg_iters: int = 24):
    """Damped (T + J_loops^T J_loops) dx = -g by preconditioned CG.

    The Woodbury path materializes a (4L, 4L) capacitance and
    Newton-Schulz-inverts it — O(L^3) per LM iteration (~100 ms at 2k
    loops on v5e, dwarfing the 2 ms BT solve). Here the loop term is
    applied SPARSELY (gather 2 endpoint blocks, two (L,4,4) einsums,
    scatter-add — O(L) bytes) inside a fixed-trip-count CG preconditioned
    by the block-tridiagonal cyclic-reduction factorization of T. An
    inexact step only makes LM damp slightly differently — accept/reject
    still evaluates the TRUE cost. Ceres solves the same systems with
    sparse Cholesky; CG + BT preconditioner is the form that maps to the
    MXU (solver.cpp:1695-1719).

    Returns (dx, warm_out); warm threads the Newton-Schulz level/tail
    state exactly like _smw_solve_core (no capacitance entry).
    """
    from omniswarm_tpu.solver.block_tridiag import (
        bt_apply, bt_factor, bt_warm_state, pack_bt_cols, pack_bt_mats,
        unpack_bt_cols)

    F, m = A.shape[0], A.shape[1]
    diagT = jnp.diagonal(A, axis1=-2, axis2=-1)
    d = lam * jnp.maximum(diagT + sl.diag, 1e-6)
    Ad = A + d[..., None] * jnp.eye(m, dtype=A.dtype)[None]
    if pack > 1:
        Adp, Bp, _ = pack_bt_mats(Ad, Boff, pack)
    else:
        Adp, Bp = Ad, Boff
    fac = bt_factor(Adp, Bp, ns_iters=8 if pack == 1 else 12,
                    direct_threshold=4,
                    warm=None if warm is None else warm[:2],
                    fused=fused_levels)

    def precond(r):
        rp = pack_bt_cols(r[..., None], pack) if pack > 1 else r[..., None]
        y = bt_apply(fac, rp)
        return (unpack_bt_cols(y, pack, F) if pack > 1 else y)[..., 0]

    # endpoint blocks concatenated once: ONE gather + ONE scatter per
    # matvec instead of two of each (the CG body runs cg_iters times —
    # kernel count is the cost at these tiny (F, m) vector sizes)
    L = sl.ja.shape[0]
    rows2 = jnp.concatenate([sl.rows_a, sl.rows_b], 0)       # (2L, 4)
    jab = jnp.concatenate([sl.ja, sl.jb], 0)                 # (2L, 4, 4)

    def hmul(v):
        """Damped-Hessian matvec: BT part + sparse loop part."""
        y = jnp.einsum("fij,fj->fi", Ad, v)
        y = y.at[:-1].add(jnp.einsum("fij,fj->fi", Boff, v[1:]))
        y = y.at[1:].add(jnp.einsum("fji,fj->fi", Boff, v[:-1]))
        vf = v.reshape(-1)
        th = jnp.einsum("kci,ki->kc", jab, vf[rows2])        # (2L, 4)
        t2 = th[:L] + th[L:]                                 # J_a v + J_b v
        contrib = jnp.einsum("kci,kc->ki", jab,
                             jnp.concatenate([t2, t2], 0))
        add = jnp.zeros_like(vf)
        add = add.at[rows2.reshape(-1)].add(contrib.reshape(-1))
        return y + add.reshape(F, m)

    b = -g
    if warm is None or len(warm) < 3:
        x = jnp.zeros_like(b)
        r = b
    else:
        # CG warm start from the previous LM iteration's step: the damped
        # Hessian and gradient change by O(step) between iterations, so
        # dx_prev is already close — one extra hmul buys most of the CG
        # sweeps back (same logic as the warm Newton-Schulz chain)
        x = warm[2]
        r = b - hmul(x)
    z = precond(r)
    p_ = z
    rz = jnp.sum(r * z)

    def step(_, carry):
        x, r, p_, rz = carry
        hp = hmul(p_)
        alpha = rz / jnp.maximum(jnp.sum(p_ * hp), 1e-30)
        x = x + alpha * p_
        r = r - alpha * hp
        z = precond(r)
        rz_new = jnp.sum(r * z)
        beta = rz_new / jnp.maximum(rz, 1e-30)
        p_ = z + beta * p_
        return x, r, p_, rz_new

    x, r, p_, rz = jax.lax.fori_loop(0, cg_iters, step, (x, r, p_, rz))
    # a non-finite warm start (shouldn't happen, but a diverged lane's dx
    # would poison every later iteration) falls back to the zero start
    x = jnp.where(jnp.all(jnp.isfinite(x)), x, jnp.zeros_like(x))
    lvl, tail = bt_warm_state(fac)
    return x.reshape(-1), (lvl, tail, x)


@highp
def _smw_solve_core(A, Boff, g, U, lam, warm=None, *, exact: bool = False,
                    pack: int = 1, fused_levels: bool = False):
    """Damped (T + U U^T) dx = -g via block-tridiag solve + Woodbury.

    exact=False (default, the LM fast path) runs the matmul-only
    Newton-Schulz cyclic reduction (block_tridiag.bt_factor/bt_apply: no
    factorization custom calls anywhere — they serialize per block on
    v5e), sweeping the gradient column in f32 and the C Woodbury columns
    in bfloat16 (that sweep is HBM-bound; the columns only feed S and the
    final correction, both f32-accumulated). exact=True keeps the full
    Cholesky path (covariances, debugging). Fast-path step error is ~1e-3
    relative across the lambda range — invisible to LM accept/reject.

    Returns ``(dx, warm_out)``. ``warm`` threads the Newton-Schulz state
    (per-level block inverses, tail inverse, capacitance inverse) across LM
    iterations: the damped Hessian changes by O(step) between iterations,
    so 3 warm NS squarings replace the full cold chains (measured ~2x on
    the factor stage). Pass warm=None for a cold start; feed each call's
    warm_out into the next. exact=True ignores warm and returns ().
    """
    import jax.scipy.linalg as jsl

    from omniswarm_tpu.solver.block_tridiag import bt_solve

    F, m = A.shape[0], A.shape[1]
    C = U.shape[-1]
    # damping on the FULL Hessian diagonal: diag(T) + diag(U U^T).
    # U may arrive bfloat16 (the batched LM loop carries it that way to
    # halve select/cast traffic); accumulate its diagonal in f32.
    diagT = jnp.diagonal(A, axis1=-2, axis2=-1)          # (F, m)
    diagU = jnp.einsum("fmc,fmc->fm", U, U,
                       preferred_element_type=A.dtype)   # (F, m)
    d = lam * jnp.maximum(diagT + diagU, 1e-6)
    Ad = A + d[..., None] * jnp.eye(m, dtype=A.dtype)[None]
    if exact:
        rhs = jnp.concatenate([-g[..., None], U], axis=-1)  # (F, m, 1+C)
        Y = bt_solve(Ad, Boff, rhs)
        yb = Y[..., 0]                                   # (F, m)
        YU = Y[..., 1:]                                  # (F, m, C)
    else:
        from omniswarm_tpu.solver.block_tridiag import (
            bt_apply, bt_factor, bt_warm_state, pack_bt_cols, pack_bt_mats,
            unpack_bt_cols)

        if pack > 1:
            # fat-block re-partition: same matrix, log2(pack) fewer
            # latency-bound reduction levels, near-lane-width blocks —
            # the F>=512 single-chip windows were level-latency dominated
            # (VERDICT r2 item 1; see block_tridiag.pack_bt_mats)
            Adp, Bp, F_true = pack_bt_mats(Ad, Boff, pack)
            gp = pack_bt_cols(g[..., None], pack)
            Up = pack_bt_cols(U, pack)
        else:
            Adp, Bp, F_true = Ad, Boff, F
            gp = g[..., None]
            Up = U
        # fat packed blocks contain a p-frame tridiagonal segment — worse
        # conditioned, so the cold Newton-Schulz needs a deeper chain
        # (measured: ns=8 stalls at 0.23 rel err at p=4; ns=10 reaches 5e-5)
        fac = bt_factor(Adp, Bp, ns_iters=8 if pack == 1 else 12,
                        direct_threshold=4,
                        warm=None if warm is None else warm[:2],
                        fused=fused_levels)
        # gradient column in f32; the C Woodbury columns sweep in bf16 —
        # they only feed S and the final correction, and the K-RHS sweep
        # is HBM-bandwidth-bound (halving bytes ~halves its time). The
        # S solve below accumulates in f32.
        yb_p = bt_apply(fac, -gp)
        YU_p = bt_apply(fac, Up.astype(jnp.bfloat16))     # stays bf16
        if pack > 1:
            yb = unpack_bt_cols(yb_p, pack, F)[..., 0]
            YU = unpack_bt_cols(YU_p, pack, F)
        else:
            yb = yb_p[..., 0]
            YU = YU_p
    S = jnp.eye(C, dtype=A.dtype) + jnp.einsum(
        "fmc,fmd->cd", U.astype(YU.dtype), YU,
        preferred_element_type=A.dtype)
    Uyb = jnp.einsum("fmc,fm->c", U, yb.astype(U.dtype),
                     preferred_element_type=A.dtype)
    if exact:
        Lc, low = jsl.cho_factor(S, lower=True)
        z = jsl.cho_solve((Lc, low), Uyb)
        warm_out = ()
    else:
        from omniswarm_tpu.solver.block_tridiag import spd_ns_inverse

        Xf = spd_ns_inverse(S, None if warm is None else warm[2])
        z = jnp.einsum("cd,d->c", Xf, Uyb)
        for _ in range(2):
            r = Uyb - jnp.einsum("cd,d->c", S, z)
            z = z + jnp.einsum("cd,d->c", Xf, r)
        lvl, tail = bt_warm_state(fac)
        warm_out = (lvl, tail, Xf)
    dx = yb - jnp.einsum("fmc,c->fm", YU, z.astype(YU.dtype),
                         preferred_element_type=A.dtype)
    return dx.reshape(-1), warm_out


def _auto_pack(F: int, m: int = 20) -> int:
    """Frames-per-block for the cyclic reduction. Large windows pay a
    latency-bound level chain on thin (m, m) blocks — pack frames into
    ~80-wide blocks from F>=384 (measured at m=20: F=1024 smw 13.0->3.2 ms
    at pack=4; pack=8 = 160-wide blocks is WORSE — Newton-Schulz FLOPs
    grow cubically with block width). Packing never exceeds 80 wide.

    Mid-size windows (the reference's production F=100) take pack=2:
    +2-3% single / +1.4% batch-8 on v5e, consistent across two r5 runs
    (F100_GRID_r05.json) — the rest of the F=100 level-latency gap is a
    measured dead end (pack=4 and the fused Pallas level are both
    NEGATIVE at this size; the chain is too short to amortize)."""
    if F < 96:
        return 1
    if F < 384:
        return min(2, max(1, 40 // max(m, 1)))
    return max(1, min(4, 80 // max(m, 1)))


def lm_solve_bt_impl(graph: DenseGraph, poses0: jnp.ndarray, *,
                     max_iterations: int = 100, huber_delta: float = 1.0,
                     det_sphere_std: float = 0.1,
                     det_inv_dep_std: float = 0.5,
                     function_tolerance: float = 1e-6,
                     exact_linear: bool = False,
                     pack: Optional[int] = None,
                     fused: Optional[bool] = None,
                     linear: str = "auto",
                     cg_iters: int = 24):
    """LM with the block-tridiagonal + Woodbury linear solver.

    ``fused``: override the Pallas fused-reduction-level choice (default:
    on for packed blocks on TPU). bench.py uses fused=False at identical
    pack to assert numerical parity of the fused path on real hardware
    (the CI tier only exercises the kernel in interpret mode).

    ``linear``: "smw" (Woodbury capacitance — exact step), "pcg"
    (BT-preconditioned CG with sparse loop application — inexact step,
    O(L) instead of O(L^3) per iteration), or "auto": pcg once the
    capacitance would exceed 4,096 columns (L > 1024 bucketed loops).
    Measured crossover on v5e: at C=2048 the capacitance Newton-Schulz
    is still ~5 ms and beats 24 preconditioned-CG sweeps (the F=4096
    sweep ran 9.1 ms/iter smw vs 15.3 pcg); at C=8192 the O(C^3) NS is
    ~100 ms and pcg wins 3-5x (ONLINE_1024.json).

    Per iteration: one cyclic-reduction factor-solve with (1 + 4L) RHS and
    one small (4L, 4L) capacitance solve — no dense (P, P) Hessian, no
    large scatters, and (by default) no per-block factorization custom
    calls (_smw_solve_core exact=False).
    """
    from omniswarm_tpu.solver.gauss_newton import SolveResult, _apply_step

    F, D = graph.pose_valid.shape
    Lb = graph.loops.valid.shape[0]
    # measured v5e crossovers: C=4L>4096 (capacitance NS turns O(C^3)-
    # dominant) or F>4096 (the (F,m,C) Woodbury sweep + S build grow
    # superlinearly: F=8192 smw 59.3 ms/iter AND a numerically stalled
    # cost vs pcg 37.4 ms/iter at a lower cost)
    use_pcg = (linear == "pcg") or (
        linear == "auto" and not exact_linear
        and (4 * Lb > 4096 or F > 4096))

    assemble = functools.partial(
        assemble_blocks, graph, huber_delta=huber_delta,
        det_sphere_std=det_sphere_std, det_inv_dep_std=det_inv_dep_std,
        loops_dense=not use_pcg)

    A0, B0, g0, U0, cost0 = assemble(poses0)
    if not exact_linear and not use_pcg:
        # the Woodbury columns sweep in bf16 anyway; carrying U bf16 halves
        # the accept-select and state traffic on the largest array
        U0 = U0.astype(jnp.bfloat16)

    pk1 = _auto_pack(F, 4 * D) if pack is None else pack
    # fused Pallas reduction levels: measured 1.8x at packed sizes
    # (80-wide blocks, large grids) but slower for thin blocks and under
    # vmap — only the packed single-instance path requests them
    if use_pcg:
        smw_solve = functools.partial(
            _pcg_solve_core, pack=pk1, cg_iters=cg_iters,
            fused_levels=(pk1 > 1) if fused is None else fused)
    else:
        smw_solve = functools.partial(
            _smw_solve_core, exact=exact_linear, pack=pk1,
            fused_levels=(pk1 > 1) if fused is None else fused)
    lam0 = jnp.asarray(1e-4, poses0.dtype)
    # cold Newton-Schulz factor seeds the warm chain (dx discarded). On
    # the pcg path the seed runs ONE CG sweep instead of cg_iters: its
    # only products are the factor warm state + an x0 the first real
    # iteration refines anyway — at serving depth (2-3 LM iters/solve,
    # ONLINE_1024) the full-strength seed was ~1/3 of the device time.
    if use_pcg:
        seed_solve = functools.partial(
            _pcg_solve_core, pack=pk1, cg_iters=1,
            fused_levels=(pk1 > 1) if fused is None else fused)
        _, warm0 = seed_solve(A0, B0, g0, U0, lam0, None)
    else:
        _, warm0 = smw_solve(A0, B0, g0, U0, lam0, None)

    def cond(state):
        return (~state[-1]) & (state[-2] < max_iterations)

    def body(state):
        poses, A, B, g, U, warm, cost, lam, it, _ = state
        dx, warm = smw_solve(A, B, g, U, lam, warm)
        bad = ~jnp.all(jnp.isfinite(dx))
        new_poses = _apply_step(poses, jnp.where(bad, 0.0, dx))
        An, Bn, gn, Un, new_cost = assemble(new_poses)
        accept = jnp.isfinite(new_cost) & (new_cost < cost) & ~bad
        poses = jnp.where(accept, new_poses, poses)
        A = jnp.where(accept, An, A)
        B = jnp.where(accept, Bn, B)
        g = jnp.where(accept, gn, g)
        # U is an array (smw) or a SparseLoops pytree (pcg)
        U = jax.tree_util.tree_map(
            lambda n, o: jnp.where(accept, n.astype(o.dtype), o), Un, U)
        out_cost = jnp.where(accept, new_cost, cost)
        lam = jnp.clip(jnp.where(accept, lam * 0.3, lam * 5.0), 1e-10, 1e10)
        converged = accept & (cost - new_cost <= function_tolerance * cost)
        stalled = (~accept) & (lam >= 1e9)
        return (poses, A, B, g, U, warm, out_cost, lam, it + 1,
                converged | stalled)

    state0 = (poses0, A0, B0, g0, U0, warm0, cost0, lam0,
              jnp.zeros((), jnp.int32), jnp.asarray(False))
    out = jax.lax.while_loop(cond, body, state0)
    poses, cost, lam, it = out[0], out[6], out[7], out[8]
    return SolveResult(poses=poses, cost=cost, initial_cost=cost0,
                       iterations=it, lam=lam)


lm_solve_bt = jax.jit(
    lm_solve_bt_impl,
    static_argnames=("max_iterations", "huber_delta", "det_sphere_std",
                     "det_inv_dep_std", "function_tolerance", "exact_linear",
                     "pack", "fused", "linear", "cg_iters"),
)


def lm_solve_bt_batched_impl(graph: DenseGraph, poses0_batch: jnp.ndarray,
                             *, max_iterations: int = 100,
                             huber_delta: float = 1.0,
                             det_sphere_std: float = 0.1,
                             det_inv_dep_std: float = 0.5,
                             function_tolerance: float = 1e-6,
                             exact_linear: bool = False,
                             pack: Optional[int] = None):
    """Batch-native BT LM: B instances advance in lock-step.

    The while_loop itself is batch-agnostic — assembly and the
    cyclic-reduction solve are vmapped *inside* the body (cheap to trace:
    the linear solve is an unrolled log-depth program, not a nested
    while_loop).

    ``graph`` may be a single DenseGraph shared by every lane (multi-init
    trials: solver.cpp:781-845 run serially in the reference) or a
    *stacked* DenseGraph with a leading batch axis matching
    ``poses0_batch`` — one independent problem per lane (fleet serving;
    parallel/swarm_batch.py builds these with stack_graphs).
    """
    from omniswarm_tpu.solver.gauss_newton import SolveResult, _apply_step

    graph_batched = graph.pose_valid.ndim == 3
    F, D = graph.pose_valid.shape[graph_batched:]
    B = poses0_batch.shape[0]

    base = functools.partial(
        assemble_blocks, huber_delta=huber_delta,
        det_sphere_std=det_sphere_std, det_inv_dep_std=det_inv_dep_std)
    if graph_batched:
        vassemble = jax.vmap(base)
        assemble = lambda poses: vassemble(graph, poses)
    else:
        assemble = jax.vmap(functools.partial(base, graph))

    pk = _auto_pack(F, 4 * D) if pack is None else pack
    smw_cold = jax.vmap(
        lambda a, b, g, u, l: _smw_solve_core(a, b, g, u, l, None,
                                              exact=exact_linear, pack=pk))
    smw_warm = jax.vmap(
        lambda a, b, g, u, l, w: _smw_solve_core(a, b, g, u, l, w,
                                                 exact=exact_linear,
                                                 pack=pk))

    A0, B0, g0, U0, cost0 = assemble(poses0_batch)
    if not exact_linear:
        U0 = U0.astype(jnp.bfloat16)
    lam0 = jnp.full((B,), 1e-4, poses0_batch.dtype)
    _, warm0 = smw_cold(A0, B0, g0, U0, lam0)

    def cond(state):
        return (~jnp.all(state[-1])) & (state[-2] < max_iterations)

    def body(state):
        poses, A, Boff, g, U, warm, cost, lam, it, done = state
        dx, warm = smw_warm(A, Boff, g, U, lam, warm)
        bad = ~jnp.all(jnp.isfinite(dx), axis=-1)
        dx = jnp.where(bad[:, None], 0.0, dx)
        new_poses = jax.vmap(_apply_step)(poses, dx)
        An, Bn, gn, Un, new_cost = assemble(new_poses)
        accept = jnp.isfinite(new_cost) & (new_cost < cost) & ~bad & ~done

        def sel(new, old):
            shape = (B,) + (1,) * (new.ndim - 1)
            return jnp.where(accept.reshape(shape), new, old)

        poses = sel(new_poses, poses)
        A = sel(An, A)
        Boff = sel(Bn, Boff)
        g = sel(gn, g)
        U = sel(Un.astype(U.dtype), U)
        out_cost = jnp.where(accept, new_cost, cost)
        lam = jnp.where(done, lam, jnp.clip(
            jnp.where(accept, lam * 0.3, lam * 5.0), 1e-10, 1e10))
        converged = accept & (cost - new_cost <= function_tolerance * cost)
        stalled = (~accept) & (lam >= 1e9) & ~done
        return (poses, A, Boff, g, U, warm, out_cost, lam, it + 1,
                done | converged | stalled)

    state0 = (poses0_batch, A0, B0, g0, U0, warm0, cost0, lam0,
              jnp.zeros((), jnp.int32), jnp.zeros((B,), bool))
    out = jax.lax.while_loop(cond, body, state0)
    poses, cost, lam, it = out[0], out[6], out[7], out[8]
    return SolveResult(poses=poses, cost=cost, initial_cost=cost0,
                       iterations=it, lam=lam)


lm_solve_bt_batched = jax.jit(
    lm_solve_bt_batched_impl,
    static_argnames=("max_iterations", "huber_delta", "det_sphere_std",
                     "det_inv_dep_std", "function_tolerance", "exact_linear",
                     "pack"),
)


@highp
def pose_covariances(graph: DenseGraph, poses: jnp.ndarray,
                     query: jnp.ndarray, *, huber_delta: float = 1.0,
                     det_sphere_std: float = 0.1,
                     det_inv_dep_std: float = 0.5) -> jnp.ndarray:
    """Marginal 4x4 covariances of selected poses at the solution.

    query: (Q, 2) int array of (frame, drone) indices. Returns (Q, 4, 4)
    blocks of H^-1 via the same block-tridiagonal + Woodbury machinery
    (each query pose contributes 4 unit-vector RHS columns). The reference
    exposes per-drone covariance in its fused outputs
    (swarm_fused msgs / ceres::Covariance); this is the batched equivalent.
    """
    import jax.scipy.linalg as jsl

    from omniswarm_tpu.solver.block_tridiag import bt_matvec, bt_solve

    F, D = graph.pose_valid.shape
    m = 4 * D
    A, Boff, g, U, _ = assemble_blocks(
        graph, poses, huber_delta=huber_delta,
        det_sphere_std=det_sphere_std, det_inv_dep_std=det_inv_dep_std)
    # Ridge + refinement: the BT part alone can be gauge-singular (the
    # information that fixes weakly observable directions often lives
    # entirely in the Woodbury U term — e.g. a remote drone's yaw pinned
    # only by a loop factor), so a fixed tiny ridge leaves cond(A) at
    # ~max_diag/1e-6 and f32 Cholesky NaNs. Instead: a SCALE-RELATIVE
    # ridge keeps the factorization f32-safe, and two iterative-refinement
    # passes against the FULL H (BT matvec + U U^T) cancel the ridge bias
    # (error per pass ~ ridge/lambda, so the bias is driven far below f32
    # resolution for any direction the mask lets through).
    ridge = 1e-6 * jnp.max(jnp.abs(A)) + 1e-12
    Ar = A + ridge * jnp.eye(m, dtype=A.dtype)[None]

    Q = query.shape[0]
    E = jnp.zeros((F, m, 4 * Q), A.dtype)
    rows = (query[:, 1, None] * 4 + jnp.arange(4)[None, :])  # (Q, 4)
    cols = (jnp.arange(Q)[:, None] * 4 + jnp.arange(4)[None, :])
    E = E.at[query[:, 0, None], rows, cols].set(1.0)

    C = U.shape[-1]
    YU = bt_solve(Ar, Boff, U)
    S = jnp.eye(C, dtype=A.dtype) + jnp.einsum("fmc,fmd->cd", U, YU)
    Lc, low = jsl.cho_factor(S, lower=True)

    def minv(rhs):
        """(BT(Ar) + U U^T)^-1 rhs via Woodbury (YU/S factor reused)."""
        Y = bt_solve(Ar, Boff, rhs)
        Z = jsl.cho_solve((Lc, low), jnp.einsum("fmc,fmq->cq", U, Y))
        return Y - jnp.einsum("fmc,cq->fmq", YU, Z)

    def happly(x):
        """Full (unridged) H x = BT(A) x + U (U^T x)."""
        return bt_matvec(A, Boff, x) + jnp.einsum(
            "fmc,cq->fmq", U, jnp.einsum("fmc,fmq->cq", U, x))

    X = minv(E)
    for _ in range(2):
        X = X + minv(E - happly(X))                    # H^-1 E
    # cov[q] = E_q^T X_q
    cov = jnp.einsum("fmq,fmp->qp", E, X)              # (4Q, 4Q) gathered
    cov = cov.reshape(Q, 4, Q, 4)
    idx = jnp.arange(Q)
    out = cov[idx, :, idx, :]
    # fixed/invalid params carry a placeholder unit diagonal in H — their
    # true (conditioned-on) covariance is zero
    free = graph.pose_valid & ~graph.pose_fixed
    m4 = jnp.repeat(free[..., None], 4, -1)
    m4 = m4.at[..., 3].set(m4[..., 3] & ~graph.yaw_fixed)
    qmask = m4[query[:, 0], query[:, 1]].astype(out.dtype)   # (Q, 4)
    return out * qmask[:, :, None] * qmask[:, None, :]


# jitted entry for production covariance queries (the estimator publishes
# per-drone covariance with every fused output; eager dispatch of the
# assembly would be one tunnel round trip per op on a remote TPU)
pose_covariances_jit = jax.jit(
    pose_covariances,
    static_argnames=("huber_delta", "det_sphere_std", "det_inv_dep_std"))


def dense_from_factor_graph(fg) -> Optional[DenseGraph]:
    """Convert a generic FactorGraph to a DenseGraph when its structure fits.

    Requirements: ego-motion factors connect consecutive frames of one
    drone with diagonal sqrt info; detections are same-frame with zero
    dpose corrections. Returns None when any factor violates the frame
    structure (the caller falls back to the generic scatter path).
    """
    import numpy as np

    pv = np.asarray(fg.pose_valid)
    F, D = pv.shape

    # --- odometry chain ------------------------------------------------
    o = fg.odoms
    ov = np.asarray(o.valid)
    rows = np.flatnonzero(ov)
    fa = np.asarray(o.frame_a)[rows]
    fb = np.asarray(o.frame_b)[rows]
    da = np.asarray(o.drone_a)[rows]
    db = np.asarray(o.drone_b)[rows]
    if rows.size and (np.any(da != db) or np.any(fb != fa + 1)):
        return None
    si_full = np.asarray(o.sqrt_info)[rows]
    if rows.size and np.abs(
            si_full - np.einsum("kij,ij->kij", si_full, np.eye(4))).max() > 1e-6:
        return None
    odom_dpose = np.zeros((max(F - 1, 1), D, 4), np.float32)
    odom_si = np.zeros((max(F - 1, 1), D, 4), np.float32)
    odom_valid = np.zeros((max(F - 1, 1), D), bool)
    odom_dpose[fa, da] = np.asarray(o.dpose)[rows]
    odom_si[fa, da] = np.einsum("kii->ki", si_full)
    odom_valid[fa, da] = True

    # --- ranges --------------------------------------------------------
    r = fg.ranges
    rv = np.asarray(r.valid)
    rrows = np.flatnonzero(rv)
    range_dist = np.zeros((F, D, D), np.float32)
    range_si = np.zeros((F, D, D), np.float32)
    range_valid = np.zeros((F, D, D), bool)
    rf = np.asarray(r.frame)[rrows]
    ra = np.asarray(r.drone_a)[rrows]
    rb = np.asarray(r.drone_b)[rrows]
    lo, hi = np.minimum(ra, rb), np.maximum(ra, rb)
    range_dist[rf, lo, hi] = np.asarray(r.dist)[rrows]
    range_si[rf, lo, hi] = np.asarray(r.sqrt_inf)[rrows]
    range_valid[rf, lo, hi] = True

    # --- detections ----------------------------------------------------
    d = fg.dets
    dv = np.asarray(d.valid)
    drows = np.flatnonzero(dv)
    dfa = np.asarray(d.frame_a)[drows]
    dfb = np.asarray(d.frame_b)[drows]
    if drows.size and np.any(dfa != dfb):
        return None
    if drows.size and (np.abs(np.asarray(d.dpose_a)[drows]).max() > 1e-9
                       or np.abs(np.asarray(d.dpose_b)[drows]).max() > 1e-9):
        return None
    dda = np.asarray(d.drone_a)[drows]
    ddb = np.asarray(d.drone_b)[drows]
    det_dir = np.zeros((F, D, D, 3), np.float32)
    det_tb = np.zeros((F, D, D, 2, 3), np.float32)
    det_invdep = np.zeros((F, D, D), np.float32)
    det_valid = np.zeros((F, D, D), bool)
    det_depth = np.zeros((F, D, D), bool)
    det_dir[dfa, dda, ddb] = np.asarray(d.direction)[drows]
    det_tb[dfa, dda, ddb] = np.asarray(d.tangent_base)[drows]
    det_invdep[dfa, dda, ddb] = np.asarray(d.inv_dep)[drows]
    det_valid[dfa, dda, ddb] = True
    det_depth[dfa, dda, ddb] = np.asarray(d.enable_depth)[drows]

    return DenseGraph(
        range_dist=jnp.asarray(range_dist),
        range_valid=jnp.asarray(range_valid),
        range_sqrt_inf=jnp.asarray(range_si),
        odom_dpose=jnp.asarray(odom_dpose),
        odom_sqrt_info=jnp.asarray(odom_si),
        odom_valid=jnp.asarray(odom_valid),
        det_dir=jnp.asarray(det_dir), det_tb=jnp.asarray(det_tb),
        det_invdep=jnp.asarray(det_invdep),
        det_valid=jnp.asarray(det_valid),
        det_has_depth=jnp.asarray(det_depth),
        loops=fg.loops,
        pose_valid=fg.pose_valid, pose_fixed=fg.pose_fixed,
        yaw_fixed=fg.yaw_fixed,
        ant_pos=fg.ant_pos,
    )

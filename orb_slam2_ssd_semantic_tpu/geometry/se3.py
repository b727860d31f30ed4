"""SO(3)/SE(3)/Sim(3) Lie-group utilities in JAX.

The reference threads cv::Mat 4x4 pose matrices and g2o SE3Quat/Sim3
objects through every layer (perfect/src/Converter.cc). Here poses are
plain JAX arrays — world-to-camera 4x4 matrices ``T_cw`` or (R, t)
pairs — and all maps are batched/vmappable, f32 by default, f64-capable
for the optimizer reductions.

All functions are shape-polymorphic over leading batch dims where noted.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

# TPU matmul/einsum default precision multiplies in bfloat16: ~0.4%
# relative error, i.e. ~2 cm absolute on 5 m coordinates — catastrophic
# for geometry (a 1.3 cm/frame pose bias on the r4 bench circuit came
# entirely from this). EVERY contraction in this module therefore runs
# at HIGHEST (true f32) precision; these are tiny (3x3/4x4/Nx3) ops, so
# the cost is nil.
_HP = jax.lax.Precision.HIGHEST
_einsum = functools.partial(jnp.einsum, precision=_HP)


def _mm(a, b):
    return jnp.matmul(a, b, precision=_HP)


def hat(w: jnp.ndarray) -> jnp.ndarray:
    """so(3) hat operator. w: (..., 3) -> (..., 3, 3)."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    z = jnp.zeros_like(wx)
    return jnp.stack(
        [
            jnp.stack([z, -wz, wy], axis=-1),
            jnp.stack([wz, z, -wx], axis=-1),
            jnp.stack([-wy, wx, z], axis=-1),
        ],
        axis=-2,
    )


def vee(W: jnp.ndarray) -> jnp.ndarray:
    """Inverse of hat. W: (..., 3, 3) -> (..., 3)."""
    return jnp.stack([W[..., 2, 1], W[..., 0, 2], W[..., 1, 0]], axis=-1)


def so3_exp(w: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues exponential map. w: (..., 3) -> R (..., 3, 3).

    Uses the Taylor-safe form near theta=0 so it is differentiable and
    branch-free (XLA-friendly; no data-dependent control flow)."""
    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(theta2 + 1e-32)
    W = hat(w)
    W2 = _mm(W, W)
    small = theta2 < 1e-12
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + a[..., None, None] * W + b[..., None, None] * W2


def so3_log(R: jnp.ndarray) -> jnp.ndarray:
    """Logarithm map. R: (..., 3, 3) -> w (..., 3)."""
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_theta = jnp.clip((trace - 1.0) / 2.0, -1.0, 1.0)
    w_raw = vee(R - jnp.swapaxes(R, -1, -2)) / 2.0  # = sin(theta) * axis
    # atan2 instead of arccos: identical on [0, pi] but with finite
    # derivatives at theta=0 (arccos'(1) = -inf breaks autodiff through
    # this map, e.g. the Sim3 pose-graph edge Jacobians).
    sin_theta = jnp.sqrt(jnp.sum(w_raw * w_raw, axis=-1) + 1e-32)
    theta = jnp.arctan2(sin_theta, cos_theta)
    # Near theta=0: w ~ vee(R - R^T)/2. Near theta=pi use diagonal form.
    small = theta < 1e-6
    scale = jnp.where(small, 1.0 + theta * theta / 6.0, theta / jnp.where(small, 1.0, sin_theta + 1e-32))
    w = w_raw * scale[..., None]
    # theta ~ pi branch: axis from diagonal of (R + I)/2.
    near_pi = theta > (jnp.pi - 1e-3)
    diag = jnp.stack([R[..., 0, 0], R[..., 1, 1], R[..., 2, 2]], axis=-1)
    axis2 = jnp.clip((diag + 1.0) / 2.0, 0.0, 1.0)
    axis = jnp.sqrt(axis2)
    # Fix signs using off-diagonal sums.
    sx = jnp.where(R[..., 2, 1] - R[..., 1, 2] >= 0, 1.0, -1.0)
    sy = jnp.where(R[..., 0, 2] - R[..., 2, 0] >= 0, 1.0, -1.0)
    sz = jnp.where(R[..., 1, 0] - R[..., 0, 1] >= 0, 1.0, -1.0)
    axis = axis * jnp.stack([sx, sy, sz], axis=-1)
    axis = axis / (jnp.linalg.norm(axis, axis=-1, keepdims=True) + 1e-32)
    w_pi = axis * theta[..., None]
    return jnp.where(near_pi[..., None], w_pi, w)


def se3_exp(xi: jnp.ndarray) -> jnp.ndarray:
    """se(3) exp. xi = (v, w): (..., 6) translation-first -> T (..., 4, 4)."""
    v, w = xi[..., :3], xi[..., 3:]
    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(theta2 + 1e-32)
    W = hat(w)
    W2 = _mm(W, W)
    small = theta2 < 1e-12
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2)
    c = jnp.where(small, 1.0 / 6.0 - theta2 / 120.0, (1.0 - a) / theta2)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=xi.dtype), W.shape)
    R = eye + a[..., None, None] * W + b[..., None, None] * W2
    V = eye + b[..., None, None] * W + c[..., None, None] * W2
    t = _einsum("...ij,...j->...i", V, v)
    return rt_to_mat(R, t)


def se3_log(T: jnp.ndarray) -> jnp.ndarray:
    """SE(3) log. T: (..., 4, 4) -> xi (..., 6), translation-first."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    w = so3_log(R)
    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(theta2 + 1e-32)
    W = hat(w)
    W2 = _mm(W, W)
    small = theta2 < 1e-12
    half_theta = theta / 2.0
    cot_term = jnp.where(
        small,
        1.0 / 12.0 + theta2 / 720.0,
        (1.0 - half_theta * jnp.cos(half_theta) / (jnp.sin(half_theta) + 1e-32)) / (theta2 + 1e-32),
    )
    eye = jnp.broadcast_to(jnp.eye(3, dtype=T.dtype), W.shape)
    V_inv = eye - 0.5 * W + cot_term[..., None, None] * W2
    v = _einsum("...ij,...j->...i", V_inv, t)
    return jnp.concatenate([v, w], axis=-1)


def rt_to_mat(R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """(R (...,3,3), t (...,3)) -> T (...,4,4)."""
    batch = R.shape[:-2]
    T = jnp.zeros(batch + (4, 4), dtype=R.dtype)
    T = T.at[..., :3, :3].set(R)
    T = T.at[..., :3, 3].set(t)
    T = T.at[..., 3, 3].set(1.0)
    return T


def mat_to_rt(T: jnp.ndarray):
    return T[..., :3, :3], T[..., :3, 3]


def se3_inverse(T: jnp.ndarray) -> jnp.ndarray:
    R, t = mat_to_rt(T)
    Rt = jnp.swapaxes(R, -1, -2)
    return rt_to_mat(Rt, -_einsum("...ij,...j->...i", Rt, t))


def transform_points(T: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """Apply T (...,4,4) to pts (..., N, 3) -> (..., N, 3)."""
    R, t = mat_to_rt(T)
    return _einsum("...ij,...nj->...ni", R, pts) + t[..., None, :]


def quat_to_rot(q: jnp.ndarray) -> jnp.ndarray:
    """Quaternion (x, y, z, w) (TUM order) -> rotation matrix (..., 3, 3)."""
    q = q / (jnp.linalg.norm(q, axis=-1, keepdims=True) + 1e-32)
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.stack(
        [
            jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)], axis=-1),
            jnp.stack([2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)], axis=-1),
            jnp.stack([2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)], axis=-1),
        ],
        axis=-2,
    )


def rot_to_quat(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix -> quaternion (x, y, z, w), branch-free (selects the
    numerically best of the four Shepperd cases with jnp.where)."""
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    # Case w: tr > 0
    sw = jnp.sqrt(jnp.maximum(tr + 1.0, 1e-12)) * 2.0
    qw = jnp.stack([(m21 - m12) / sw, (m02 - m20) / sw, (m10 - m01) / sw, sw / 4.0], axis=-1)
    # Case x
    sx = jnp.sqrt(jnp.maximum(1.0 + m00 - m11 - m22, 1e-12)) * 2.0
    qx = jnp.stack([sx / 4.0, (m01 + m10) / sx, (m02 + m20) / sx, (m21 - m12) / sx], axis=-1)
    # Case y
    sy = jnp.sqrt(jnp.maximum(1.0 - m00 + m11 - m22, 1e-12)) * 2.0
    qy = jnp.stack([(m01 + m10) / sy, sy / 4.0, (m12 + m21) / sy, (m02 - m20) / sy], axis=-1)
    # Case z
    sz = jnp.sqrt(jnp.maximum(1.0 - m00 - m11 + m22, 1e-12)) * 2.0
    qz = jnp.stack([(m02 + m20) / sz, (m12 + m21) / sz, sz / 4.0, (m10 - m01) / sz], axis=-1)

    use_w = tr > 0
    use_x = (~use_w) & (m00 >= m11) & (m00 >= m22)
    use_y = (~use_w) & (~use_x) & (m11 >= m22)
    q = jnp.where(
        use_w[..., None], qw, jnp.where(use_x[..., None], qx, jnp.where(use_y[..., None], qy, qz))
    )
    return q / (jnp.linalg.norm(q, axis=-1, keepdims=True) + 1e-32)


# ---- Sim(3) ---------------------------------------------------------------


def sim3_apply(s: jnp.ndarray, R: jnp.ndarray, t: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """Apply similarity (s, R, t) to pts (..., N, 3)."""
    return s[..., None, None] * _einsum("...ij,...nj->...ni", R, pts) + t[..., None, :]


def sim3_inverse(s: jnp.ndarray, R: jnp.ndarray, t: jnp.ndarray):
    Rt = jnp.swapaxes(R, -1, -2)
    s_inv = 1.0 / s
    return s_inv, Rt, -s_inv[..., None] * _einsum("...ij,...j->...i", Rt, t)


def sim3_compose(s1, R1, t1, s2, R2, t2):
    """(s1,R1,t1) o (s2,R2,t2): first apply 2, then 1."""
    return s1 * s2, _mm(R1, R2), s1[..., None] * _einsum("...ij,...j->...i", R1, t2) + t1


def _sim3_W(phi: jnp.ndarray, sigma: jnp.ndarray) -> jnp.ndarray:
    """The Sim(3) translation coupling matrix W(phi, sigma) with
    exp([rho, phi, sigma]) = (e^sigma, so3_exp(phi), W rho)
    (Strasdat, "Local accuracy and global consistency for efficient
    visual SLAM", eq. 5.7; branch-free Taylor-safe form)."""
    theta2 = jnp.sum(phi * phi, axis=-1)
    theta = jnp.sqrt(theta2 + 1e-32)
    s = jnp.exp(sigma)
    Phi = hat(phi)
    Phi2 = _mm(Phi, Phi)

    sig_small = jnp.abs(sigma) < 1e-5
    th_small = theta2 < 1e-10
    sigma_safe = jnp.where(sig_small, 1.0, sigma)
    theta_safe = jnp.where(th_small, 1.0, theta)
    denom = sigma_safe * sigma_safe + theta2

    # C = (s - 1) / sigma, -> 1 as sigma -> 0.
    C = jnp.where(sig_small, 1.0 + sigma / 2.0, (s - 1.0) / sigma_safe)
    # A and B (coefficients of Phi and Phi^2).
    sin_t, cos_t = jnp.sin(theta), jnp.cos(theta)
    A_g = (s * sin_t * sigma_safe + (1.0 - s * cos_t) * theta) / (
        theta_safe * denom
    )
    B_g = (
        C - ((s * cos_t - 1.0) * sigma_safe + s * sin_t * theta) / denom
    ) / jnp.where(th_small, 1.0, theta2)
    # sigma -> 0 limits: A -> (1 - cos)/theta^2, B -> (theta - sin)/theta^3.
    A_0 = jnp.where(th_small, 0.5, (1.0 - cos_t) / jnp.where(th_small, 1.0, theta2))
    B_0 = jnp.where(
        th_small, 1.0 / 6.0, (theta - sin_t) / jnp.where(th_small, 1.0, theta2 * theta_safe)
    )
    # theta -> 0 limits (sigma != 0), from the Taylor expansion in theta.
    A_t0 = (s * sigma_safe - s + 1.0) / (sigma_safe * sigma_safe)
    B_t0 = (s - 1.0) / sigma_safe**3 - (s - s * sigma_safe / 2.0) / (
        sigma_safe * sigma_safe
    )
    A = jnp.where(sig_small, A_0, jnp.where(th_small, A_t0, A_g))
    B = jnp.where(sig_small, B_0, jnp.where(th_small, B_t0, B_g))

    eye = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), Phi.shape)
    return (
        C[..., None, None] * eye
        + A[..., None, None] * Phi
        + B[..., None, None] * Phi2
    )


def sim3_exp(v: jnp.ndarray):
    """Sim(3) exponential. v (..., 7) = [rho, phi, sigma] ->
    (s (...,), R (..., 3, 3), t (..., 3))."""
    rho, phi, sigma = v[..., 0:3], v[..., 3:6], v[..., 6]
    W = _sim3_W(phi, sigma)
    return jnp.exp(sigma), so3_exp(phi), _einsum("...ij,...j->...i", W, rho)


def sim3_log(s: jnp.ndarray, R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Sim(3) logarithm -> (..., 7) = [rho, phi, sigma]."""
    sigma = jnp.log(s)
    phi = so3_log(R)
    W = _sim3_W(phi, sigma)
    rho = jnp.linalg.solve(W, t[..., None])[..., 0]
    return jnp.concatenate([rho, phi, sigma[..., None]], axis=-1)


def horn_sim3(src: jnp.ndarray, dst: jnp.ndarray, mask: jnp.ndarray | None = None,
              with_scale: bool = True):
    """Closed-form similarity/rigid alignment dst ~ s*R*src + t.

    Umeyama least-squares (the same estimator the reference uses for
    Sim3Solver::ComputeSim3, perfect/src/Sim3Solver.cc:221-284, and for
    tool/evaluate_ate.py align_sim3). Batched over leading dims; `mask`
    (..., N) selects valid correspondences.

    Returns (s, R, t).
    """
    if mask is None:
        mask = jnp.ones(src.shape[:-1], dtype=src.dtype)
    m = mask[..., None]
    n = jnp.maximum(jnp.sum(mask, axis=-1), 1.0)
    mu_s = jnp.sum(src * m, axis=-2) / n[..., None]
    mu_d = jnp.sum(dst * m, axis=-2) / n[..., None]
    sc = (src - mu_s[..., None, :]) * m
    dc = (dst - mu_d[..., None, :]) * m
    # Cross-covariance (3x3).
    C = _einsum("...ni,...nj->...ij", dc, sc) / n[..., None, None]
    var_s = jnp.sum(sc * sc, axis=(-1, -2)) / n
    U, D, Vt = jnp.linalg.svd(C)
    det = jnp.linalg.det(U) * jnp.linalg.det(Vt)
    S = jnp.ones_like(D).at[..., 2].set(jnp.sign(det))
    R = _mm(U, S[..., :, None] * Vt)
    if with_scale:
        s = jnp.sum(D * S, axis=-1) / jnp.maximum(var_s, 1e-32)
    else:
        s = jnp.ones(R.shape[:-2], dtype=src.dtype)
    t = mu_d - s[..., None] * _einsum("...ij,...j->...i", R, mu_s)
    return s, R, t


def is_rotation_matrix(R: jnp.ndarray, tol: float = 1e-4) -> jnp.ndarray:
    """Orthonormality check (reference: Geometry.cc:555 assert)."""
    err = jnp.linalg.norm(_mm(R, jnp.swapaxes(R, -1, -2)) - jnp.eye(3, dtype=R.dtype), axis=(-1, -2))
    return err < tol

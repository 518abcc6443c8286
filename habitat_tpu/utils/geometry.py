"""Geometry helpers: quaternions, rotations, coordinate conventions.

Replaces reference habitat-lab/habitat/utils/geometry_utils.py (quaternion ops on
numpy-quaternion) with pure jnp functions usable inside jit/vmap.

Habitat coordinate convention (kept): y-up, agent forward is -z, right is +x.
A heading/yaw of 0 faces -z; positive yaw turns left (counter-clockwise around +y),
matching the reference's quaternion convention where ``TURN_LEFT`` increases the
angle about +y (see habitat-lab/habitat/tasks/nav/nav.py:327-371 HeadingSensor:
heading is computed via quaternion rotation of the -z axis; phi = atan2(-x, -z)
... reference uses atan2(heading_vector[0], heading_vector[2]) with rotated [0,0,-1]).
"""

from __future__ import annotations

import jax.numpy as jnp

EPS = 1e-8


def yaw_to_forward(yaw):
    """Unit forward vector in the xz plane for a given yaw (0 -> -z)."""
    # Rotating [0,0,-1] by +yaw about +y: x = -sin(yaw), z = -cos(yaw)
    return jnp.stack(
        [-jnp.sin(yaw), jnp.zeros_like(yaw), -jnp.cos(yaw)], axis=-1
    )


def yaw_to_right(yaw):
    """Unit right vector (+x at yaw=0)."""
    return jnp.stack(
        [jnp.cos(yaw), jnp.zeros_like(yaw), -jnp.sin(yaw)], axis=-1
    )


def rotate_world_to_agent(vec, yaw):
    """Express a world-frame xz vector in the agent frame (agent forward = -z).

    Matches reference ``quaternion_rotate_vector(rotation.inverse(), v)`` usage in
    PointGoalSensor (_compute_pointgoal, nav.py:160-192).
    vec: (..., 3), yaw: (...,)
    """
    c, s = jnp.cos(yaw), jnp.sin(yaw)
    x, y, z = vec[..., 0], vec[..., 1], vec[..., 2]
    # world->agent is rotation by -yaw about +y:
    #   x' =  cos(yaw)*x - sin(yaw)*z ; z' = sin(yaw)*x + cos(yaw)*z
    xp = c * x - s * z
    zp = s * x + c * z
    return jnp.stack([xp, y, zp], axis=-1)


def rotate_agent_to_world(vec, yaw):
    c, s = jnp.cos(yaw), jnp.sin(yaw)
    x, y, z = vec[..., 0], vec[..., 1], vec[..., 2]
    xp = c * x + s * z
    zp = -s * x + c * z
    return jnp.stack([xp, y, zp], axis=-1)


def cartesian_to_polar(x, y):
    """(rho, phi) as in reference utils/geometry_utils.py cartesian_to_polar."""
    rho = jnp.sqrt(x**2 + y**2)
    phi = jnp.arctan2(y, x)
    return rho, phi


def quat_from_yaw_pitch(yaw, pitch):
    """Quaternion (w,x,y,z) for rotation about +y by yaw then +x(local) by pitch."""
    cy, sy = jnp.cos(yaw * 0.5), jnp.sin(yaw * 0.5)
    cp, sp = jnp.cos(pitch * 0.5), jnp.sin(pitch * 0.5)
    # q = q_yaw * q_pitch
    w = cy * cp
    x = cy * sp
    y = sy * cp
    z = -sy * sp
    return jnp.stack([w, x, y, z], axis=-1)


def quat_rotate(q, v):
    """Rotate vectors v (...,3) by quaternion q (...,4) [w,x,y,z]."""
    w = q[..., 0:1]
    u = q[..., 1:4]
    uv = jnp.cross(u, v)
    uuv = jnp.cross(u, uv)
    return v + 2.0 * (w * uv + uuv)


def camera_rays(yaw, pitch, hfov_rad, height, width):
    """Per-pixel world-space ray directions for a pinhole camera.

    Camera looks along agent forward (-z at yaw=0), rotated by yaw about +y and
    pitch about camera-local +x (look up positive). Returns (height, width, 3)
    normalized directions for scalar yaw/pitch, batched if yaw/pitch batched.
    """
    # pixel grid in camera frame: x right, y up, looking along -z
    fx = jnp.tan(hfov_rad / 2.0)
    # reference sensors use square pixels w/ hfov; vfov from aspect
    xs = jnp.linspace(-fx, fx, width)
    aspect = height / width
    ys = jnp.linspace(fx * aspect, -fx * aspect, height)
    xx, yy = jnp.meshgrid(xs, ys)  # (H, W)
    dirs = jnp.stack([xx, yy, -jnp.ones_like(xx)], axis=-1)  # (H, W, 3)
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    return rotate_dirs(dirs, yaw, pitch)


def rotate_dirs(d, yaw, pitch):
    """Camera-frame -> world: pitch about camera +x, then yaw about +y."""
    cp, sp = jnp.cos(pitch), jnp.sin(pitch)
    x, y, z = d[..., 0], d[..., 1], d[..., 2]
    # pitch about +x (look up = positive pitch)
    y2 = cp * y - sp * z
    z2 = sp * y + cp * z
    cyw, syw = jnp.cos(yaw), jnp.sin(yaw)
    x3 = cyw * x + syw * z2
    z3 = -syw * x + cyw * z2
    return jnp.stack([x3, y2, z3], axis=-1)


def view_rotation_matrix(yaw, pitch):
    """(...,) yaw/pitch -> (..., 3, 3) R with d_world = R @ d_camera
    (columns are the rotated camera basis vectors; same rotation as
    rotate_dirs, exposed for the fused-raygen render path)."""
    eye = jnp.eye(3)
    cols = [rotate_dirs(eye[k], yaw, pitch) for k in range(3)]
    return jnp.stack(cols, axis=-1)


def angle_diff(a, b):
    """Smallest signed angle a-b wrapped to [-pi, pi]."""
    d = a - b
    return jnp.arctan2(jnp.sin(d), jnp.cos(d))


def equirect_rays(yaw, pitch, height, width):
    """Equirectangular camera rays (reference equirect sensors,
    habitat_simulator.py:231-243): full 360x180 panorama directions rotated by
    the agent yaw (pitch applied as a latitude shift)."""
    lon = jnp.linspace(-jnp.pi, jnp.pi, width, endpoint=False)
    lat = jnp.linspace(jnp.pi / 2, -jnp.pi / 2, height)
    LO, LA = jnp.meshgrid(lon, lat)
    LA = LA + pitch
    x = -jnp.sin(LO + yaw) * jnp.cos(LA)
    y = jnp.sin(LA)
    z = -jnp.cos(LO + yaw) * jnp.cos(LA)
    return jnp.stack([x, y, z], axis=-1)


def fisheye_rays(yaw, pitch, fov_rad, height, width):
    """Equidistant fisheye rays (reference fisheye sensors,
    habitat_simulator.py:246-258): angle from axis proportional to radius.
    Pixels outside the image circle look along the axis (masked by callers)."""
    ys = jnp.linspace(1.0, -1.0, height)
    xs = jnp.linspace(-1.0, 1.0, width)
    xx, yy = jnp.meshgrid(xs, ys)
    r = jnp.sqrt(xx**2 + yy**2)
    theta = jnp.clip(r, 0.0, 1.0) * (fov_rad / 2.0)
    phi = jnp.arctan2(yy, xx)
    # camera frame: forward -z
    d_cam = jnp.stack(
        [
            jnp.sin(theta) * jnp.cos(phi),
            jnp.sin(theta) * jnp.sin(phi),
            -jnp.cos(theta),
        ],
        axis=-1,
    )

    cp, sp = jnp.cos(pitch), jnp.sin(pitch)
    x, y, z = d_cam[..., 0], d_cam[..., 1], d_cam[..., 2]
    y2 = cp * y - sp * z
    z2 = sp * y + cp * z
    cyw, syw = jnp.cos(yaw), jnp.sin(yaw)
    x3 = cyw * x + syw * z2
    z3 = -syw * x + cyw * z2
    return jnp.stack([x3, y2, z3], axis=-1)

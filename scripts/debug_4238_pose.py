"""4238 pre-MSV pose-model experiment: translation-only vs 6-DoF (host f64)."""
import sys
sys.path.insert(0, "/root/repo")
import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp

from velocity_tpu.solvers.pose import estimate_world_camera_pose
from velocity_tpu.camera.database import camera_info
from velocity_tpu.geometry.plate import license_plate_points
from velocity_tpu.geometry.projection import image_to_world_plane
from velocity_tpu.pipeline.roi import bounding_rect, inside_bbox

d = np.load("/tmp/run4238.npz")
track, valid, B = d["track_px"], d["valid"], d["B"]
z = np.load("/root/repo/data/IMG_4238.MOV.npz")
q = z["q"].astype(np.float64) * 0.5
cam = camera_info("/root/reference/data/IMG_4238.MOV", "iPhone 6s")
intr = cam.intrinsics(scale=0.5).astype(jnp.float64)
plate = jnp.asarray(license_plate_points("Chile"), jnp.float64)

pose0 = estimate_world_camera_pose(intr, jnp.asarray(q), plate, find_R=True)
R0 = np.asarray(pose0.R)
t0 = np.asarray(pose0.t)
print("frame0 res", float(pose0.residual_rms), "t0", t0)

p0 = track[0]
v0 = valid[0]
boxa = bounding_rect(q, (1080, 1920), border=(0, 0))
vp = v0 & inside_bbox(np.nan_to_num(p0), boxa)
print("plate-box lanes:", vp.sum())
pw2 = np.asarray(image_to_world_plane(intr, pose0.R, pose0.t,
                                      jnp.asarray(np.nan_to_num(p0), jnp.float64)))
pw3 = np.concatenate([pw2, np.zeros((pw2.shape[0], 1))], 1)
p3 = pw3 @ R0 + t0

prev_t = t0.copy()
prev_t6 = t0.copy()
R6 = np.eye(3)
print(" f |   t-only dx  (res)  |   6-DoF dx  (res)   |rot deg")
for f in range(1, 6):
    m = vp & valid[f] & np.isfinite(track[f]).all(1)
    pz = jnp.asarray(np.nan_to_num(track[f]), jnp.float64)
    pose_t = estimate_world_camera_pose(
        intr, pz, jnp.asarray(p3), t0=jnp.asarray(prev_t), R0=jnp.eye(3),
        find_R=False, mask=jnp.asarray(m))
    pose_rt = estimate_world_camera_pose(
        intr, pz, jnp.asarray(p3), t0=jnp.asarray(prev_t6),
        R0=jnp.asarray(R6), find_R=True, mask=jnp.asarray(m))
    t_t = np.asarray(pose_t.t)
    t_rt = np.asarray(pose_rt.t)
    dx_t = np.linalg.norm(t_t - prev_t)
    dx_rt = np.linalg.norm(t_rt - prev_t6)
    Rn = np.asarray(pose_rt.R)
    ang = np.degrees(np.arccos(np.clip((np.trace(Rn) - 1) / 2, -1, 1)))
    print(f"{f:2d} | {dx_t:8.3f} ({float(pose_t.residual_rms):5.2f}) |"
          f" {dx_rt:8.3f} ({float(pose_rt.residual_rms):5.2f}) | {ang:5.2f}")
    prev_t = t_t
    prev_t6 = t_rt
    R6 = Rn
print("speed t-only ~", np.linalg.norm(prev_t - t0) / 5 * 29.97 * 3.6)
print("speed 6dof  ~", np.linalg.norm(prev_t6 - t0) / 5 * 29.97 * 3.6)

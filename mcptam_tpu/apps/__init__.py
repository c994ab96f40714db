"""Executable entry points — the analogues of the reference's five
binaries (CMakeLists.txt:59-105):

  python -m mcptam_tpu.apps.mcptam             (standalone tracker+mapper)
  python -m mcptam_tpu.apps.client             (on-board tracking front-end)
  python -m mcptam_tpu.apps.server             (off-board map server)
  python -m mcptam_tpu.apps.camera_calibrator  (intrinsic Taylor calibration)
  python -m mcptam_tpu.apps.pose_calibrator    (rig extrinsic calibration)

All are headless and file-driven: rig configs are JSON
(io/rig_config.py), video is (C,T,H,W) uint8 .npy/.npz replayed through
the native synchronized frame queue.
"""

"""detmatch_tpu: TPU-native semi-supervised joint 2D+3D detection framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the reference
DetMatch framework (semi-supervised joint 2D+3D object detection on KITTI):
PV-RCNN 3D detection, Faster R-CNN 2D detection, and the DetMatch
teacher-student SSL machinery — designed TPU-first with static shapes,
validity masks, and on-device batched ops (no host round-trips in the
training step).
"""

__version__ = "0.1.0"

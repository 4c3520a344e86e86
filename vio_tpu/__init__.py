"""vio_tpu: a TPU-native visual-inertial odometry framework (JAX/XLA/Pallas).

Built from scratch with the capability set of the reference
AlexGeControl/Visual-Inertial-Odometry workspace (VINS-Mono-style pipeline:
KLT frontend, IMU preintegration, sliding-window BA with marginalization,
SfM initialization, loop closing), re-designed TPU-first.
"""
__version__ = "0.1.0"

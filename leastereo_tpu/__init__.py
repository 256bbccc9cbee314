"""leastereo_tpu — TPU-native stereo-depth framework with NAS.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the
LEAStereo reference (NeurIPS 2020 hierarchical NAS stereo matching +
satellite-stereo extensions): searchable 2D feature / 3D matching supernets,
genotype decoding, decoded retraining models, cost-volume stereo inference,
data pipelines, and distributed execution over TPU meshes.
"""

__version__ = "0.1.0"

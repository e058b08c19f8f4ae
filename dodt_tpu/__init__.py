"""dodt_tpu — TPU-native streaming 3D detection & tracking framework.

A ground-up JAX/XLA/Pallas re-design of the DODT capability set
(streaming 3D object detection + multi-object tracking on KITTI,
reference: Guoxs/DODT, ICRA 2020): BEV+RGB two-stage detection (AVOD),
siamese paired-frame detection with a correlation temporal head, motion
offset interpolation (MoI) over non-keyframes, and IoU/Kalman trackers.

Design stance (vs. the TF1 feed_dict reference):
  * everything on the compute path is functional, statically shaped and
    jit-able end to end (BEV rasterization included);
  * batching is first-class — the reference's batch-1 feed loop becomes a
    (batch, frame) leading axis sharded over a `jax.sharding.Mesh`;
  * dynamic-size constructs (empty-anchor filtering, NMS, mini-batch
    sampling, track books) become fixed-capacity masked tensors;
  * the correlation op (CUDA in the reference) is a Pallas TPU kernel;
  * checkpointing is orbax, optimization is optax, modules are Flax.
"""

__version__ = "0.1.0"

"""pemp_tpu — TPU-native bottom-up multi-person 2D pose estimation with
message-passing networks.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
nibox/Pose-Estimation-with-Message-Passing-Networks (reference mounted at
/root/reference). A CNN backbone (HigherHRNet-w32/w48 or Hourglass) produces
heatmaps + associative-embedding tagmaps + features; keypoint candidates are
extracted on-device (max-pool NMS + per-type top-K), turned into a
fixed-shape padded graph, refined by a message-passing network, and grouped
into poses by correlation clustering / greedy assembly — all static-shape and
jit-compiled end to end.

Design (TPU-first, not a port):
  * fixed shapes at the detection boundary: (J * K) padded nodes + validity
    masks replace the reference's dynamic per-image node counts
    (reference: src/graph_constructor/ConstructGraph.py:46-249)
  * message passing via segment ops over a combined (target, source-type)
    index — one op instead of the reference's 17-way python scatter loop
    (reference: src/Models/MessagePassingNetwork/layers.py:234-240)
  * multi-scale + flip TTA batched into the device batch dimension
  * data parallelism via jax.sharding Mesh + jit, collectives over ICI
"""

__version__ = "0.1.0"

from pemp_tpu.config import get_config, update_config, update_config_command  # noqa: F401

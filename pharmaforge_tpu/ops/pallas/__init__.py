from pharmaforge_tpu.ops.pallas.gvp_message import (
    fused_neighbor_messages,
    neighbor_messages_reference,
    pallas_supported,
)

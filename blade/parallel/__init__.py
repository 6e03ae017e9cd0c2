"""BLADE-TPU parallel subpackage.

Mesh axes: ``dp`` (data), ``fsdp`` (ZeRO-analogue param/opt sharding),
``tp`` (tensor), ``sp`` (sequence / ring attention), ``pp`` (pipeline
over the scan-stacked DiT blocks).  ``mesh.py`` holds the sharding
rules; ``ring_attention.py`` and ``pipeline.py`` are shard_map programs
whose collectives ride the ICI ring.
"""

from blade.parallel.mesh import (  # noqa: F401
    make_mesh,
    param_sharding_rules,
    replicate,
    shard_batch,
    shard_params,
)
from blade.parallel.pipeline import (  # noqa: F401
    make_cog_block_fn,
    make_wan_block_fn,
    pipeline_blocks,
)
from blade.parallel.ring_attention import (  # noqa: F401
    make_ring_attention_fn,
    ring_flash_attention,
)

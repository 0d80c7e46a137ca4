from omniswarm_tpu.models.superpoint import (  # noqa: F401
    SuperPoint,
    SuperPointExtractor,
)
from omniswarm_tpu.models.netvlad import (  # noqa: F401
    GlobalDescriptorExtractor,
    MobileNetVLAD,
    NetVLAD,
)

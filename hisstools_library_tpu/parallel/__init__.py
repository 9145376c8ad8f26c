from .mesh import (  # noqa: F401
    BLOCK_AXIS,
    CHANNEL_AXIS,
    channel_sharding,
    channel_time_sharding,
    make_mesh,
    replicated,
)
from .halo import left_halo, shift_from_left  # noqa: F401
from .fft_sharded import (  # noqa: F401
    convolve_sharded,
    fft_sharded,
    real_sharded_eligible,
    rfft_sharded,
    rifft_sharded,
    sharded_eligible,
)
from .sharded import (  # noqa: F401
    n_to_one_offline,
    scheme_offline_sharded,
    scheme_stream_any_sharded,
    scheme_stream_sharded,
)

from . import time_domain  # noqa: F401
from . import partitioned  # noqa: F401
from . import mono  # noqa: F401
from .mono import LatencyMode, PartitionScheme, MonoConvolve  # noqa: F401
from .partitioned import PartitionedConvolve  # noqa: F401
from .time_domain import TimeDomainConvolve  # noqa: F401

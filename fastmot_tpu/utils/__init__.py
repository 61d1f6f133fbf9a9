from .profiler import Profiler  # noqa: F401
from .decoder import ConfigDecoder  # noqa: F401

"""Core substrate: functional modules, configs, mesh/sharding, precision.

This is the runtime layer the PyTorch reference never had (SURVEY.md §7 step 1).
"""

from imagecaptioner_tpu.core import config, mesh, modules, precision  # noqa: F401

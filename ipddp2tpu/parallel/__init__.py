from .mesh import make_mesh, solve_sharded, sharded_batch_stats
from .timeshard import value_scan_timesharded

__all__ = ["make_mesh", "solve_sharded", "sharded_batch_stats",
           "value_scan_timesharded"]

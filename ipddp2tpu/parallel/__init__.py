from .mesh import make_mesh, solve_sharded, sharded_batch_stats

__all__ = ["make_mesh", "solve_sharded", "sharded_batch_stats"]

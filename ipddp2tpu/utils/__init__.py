from .printing import exit_message, iteration_logger, solver_banner
from .checkpoint import load_state, save_state

__all__ = ["solver_banner", "iteration_logger", "exit_message",
           "save_state", "load_state"]

from .newton import hybrd, hybrj, ConvergedEarly, SolverError
from .ptc import PTCSolver, PTC_CONVERGED_USER, PTC_REASONS

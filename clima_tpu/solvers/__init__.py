from .newton import hybrd, hybrj, ConvergedEarly, SolverError

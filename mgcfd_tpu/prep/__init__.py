from .incidence import build_incidence, IncidenceTables
from .renumber import rcm_order, apply_node_order, locality_stats

__all__ = ["build_incidence", "IncidenceTables", "rcm_order",
           "apply_node_order", "locality_stats"]

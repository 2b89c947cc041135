from .exact import dec, money_sum, money_avg, revenue
from .vectors import cosine_sim, dot, l2_norm

__all__ = ["dec", "money_sum", "money_avg", "revenue",
           "cosine_sim", "dot", "l2_norm"]

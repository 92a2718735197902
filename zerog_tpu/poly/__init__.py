from .ntt import NttPlan
from .domain import Domain, get_domain

__all__ = ["NttPlan", "Domain", "get_domain"]

from .small_step import SmallStepLoop, small_step_golden
from .rk3 import RK3Integrator, rk3_golden, rk3_stages

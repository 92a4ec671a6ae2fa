from .common import (Integrator, SplattingIntegrator, render,
                     render_adaptive, render_splat, mis_power, mis_balance)
from .ao import IntegratorAO
from .direct import IntegratorDirect
from .path import IntegratorPathTracing, STRATEGY_ALL, STRATEGY_BSDF, STRATEGY_EMITTER
from .light import IntegratorLightTracing
from .vpl import IntegratorVPL
from .meta import IntegratorAverage, IntegratorEqualTime
from .vol_primitives import IntegratorVolPrimitives
from .point_normal import IntegratorPointNormal
from .plane_single import IntegratorSinglePlane

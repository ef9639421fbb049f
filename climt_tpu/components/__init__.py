"""Physics components of the framework.

Inventory mirrors the reference's exported component list
(/root/reference/climt/_components/__init__.py:1-20); every class here is a
from-scratch JAX implementation.
"""

from .radiation import Frierson06LongwaveOpticalDepth, GrayLongwaveRadiation


def _not_yet(name):
    class _Placeholder:
        def __init__(self, *a, **k):
            raise NotImplementedError(
                '{} is not implemented yet in climt_tpu'.format(name))
    _Placeholder.__name__ = name
    return _Placeholder


try:
    from .held_suarez import HeldSuarez
except ImportError:
    HeldSuarez = _not_yet('HeldSuarez')
try:
    from .condensation import GridScaleCondensation
except ImportError:
    GridScaleCondensation = _not_yet('GridScaleCondensation')
try:
    from .dry_convection import DryConvectiveAdjustment
except ImportError:
    DryConvectiveAdjustment = _not_yet('DryConvectiveAdjustment')
try:
    from .slab_surface import SlabSurface
except ImportError:
    SlabSurface = _not_yet('SlabSurface')
try:
    from .snow_ice import IceSheet, LandIce, SeaIce
except ImportError:
    IceSheet = _not_yet('IceSheet')
    LandIce = _not_yet('LandIce')
    SeaIce = _not_yet('SeaIce')
try:
    from .boundary_layer import SimpleBoundaryLayer
except ImportError:
    SimpleBoundaryLayer = _not_yet('SimpleBoundaryLayer')
try:
    from .second_best import (
        BestSoilProperties, BestSubsurfaceTransport, BestSurfaceAlbedo,
        BestSurfaceFluxes, BestSurfaceLayer, SecondBEST)
except ImportError:
    SecondBEST = _not_yet('SecondBEST')
try:
    from .geodata import DataOcean, LandMask
except ImportError:
    DataOcean = _not_yet('DataOcean')
    LandMask = _not_yet('LandMask')
try:
    from .bucket_hydrology import BucketHydrology
except ImportError:
    BucketHydrology = _not_yet('BucketHydrology')
try:
    from .berger_solar_insolation import BergerSolarInsolation
except ImportError:
    BergerSolarInsolation = _not_yet('BergerSolarInsolation')
try:
    from .instellation import Instellation
except ImportError:
    Instellation = _not_yet('Instellation')
try:
    from .simple_physics import SimplePhysics
except ImportError:
    SimplePhysics = _not_yet('SimplePhysics')
try:
    from .emanuel_convection import (EmanuelConvection,
                                     EmanuelConvectionPython)
except ImportError:
    EmanuelConvection = _not_yet('EmanuelConvection')
try:
    from .dcmip import DcmipInitialConditions
except ImportError:
    DcmipInitialConditions = _not_yet('DcmipInitialConditions')
try:
    from .rrtmg.longwave import RRTMGLongwave
except ImportError:
    RRTMGLongwave = _not_yet('RRTMGLongwave')
try:
    from .rrtmg.shortwave import RRTMGShortwave
except ImportError:
    RRTMGShortwave = _not_yet('RRTMGShortwave')

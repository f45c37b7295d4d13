from . import quat, control, samplers

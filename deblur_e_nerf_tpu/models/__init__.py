from . import trajectory

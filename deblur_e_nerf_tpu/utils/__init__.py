from . import config, tree

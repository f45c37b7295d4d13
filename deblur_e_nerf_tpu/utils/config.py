"""YAML configuration loading.

The reference parses flat YAML into an attribute-access dict with zero
validation (reference: scripts/run.py:22-24).  We keep the exact YAML schema
(config files are interchangeable) but load into our own `ConfigDict` since
`easydict` is not a dependency, and add light validation at the consumers.
"""

import copy
import yaml


class ConfigDict(dict):
    """A dict with attribute access, recursively applied to nested dicts."""

    def __init__(self, d=None, **kwargs):
        super().__init__()
        if d is None:
            d = {}
        d = dict(d, **kwargs)
        for key, value in d.items():
            self[key] = value

    @staticmethod
    def _wrap(value):
        if isinstance(value, dict) and not isinstance(value, ConfigDict):
            return ConfigDict(value)
        if isinstance(value, (list, tuple)):
            return type(value)(ConfigDict._wrap(v) for v in value)
        return value

    def __setitem__(self, key, value):
        super().__setitem__(key, ConfigDict._wrap(value))

    def __setattr__(self, name, value):
        self[name] = value

    def __getattr__(self, name):
        try:
            return self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def __delattr__(self, name):
        try:
            del self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def __deepcopy__(self, memo):
        return ConfigDict(
            {k: copy.deepcopy(v, memo) for k, v in self.items()}
        )

    def to_dict(self):
        def unwrap(value):
            if isinstance(value, ConfigDict):
                return {k: unwrap(v) for k, v in value.items()}
            if isinstance(value, (list, tuple)):
                return type(value)(unwrap(v) for v in value)
            return value

        return unwrap(self)


def load_config(path):
    """Load a YAML config file into a ConfigDict.

    Accepts the reference's config schema verbatim
    (reference: configs/train/synthetic.yaml).
    """
    with open(path) as f:
        raw = yaml.safe_load(f)
    return ConfigDict(raw)


def save_config(config, path):
    with open(path, "w") as f:
        yaml.safe_dump(
            config.to_dict() if isinstance(config, ConfigDict) else config, f
        )

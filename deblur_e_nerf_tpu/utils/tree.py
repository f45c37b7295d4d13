"""Pytree utilities: selective state extraction and freeze masks.

TPU-native analog of the reference's per-component checkpoint loading
(`extract_descendent_state_dict`, reference: deblur_e_nerf/utils/modules.py:16-35)
and per-parameter freezing (reference: models/deblur_e_nerf.py:345-387).
Parameters live in nested dicts (flax-style), so component selection is a
subtree pick and freezing is an optax mask over tree paths.
"""

import jax


def extract_subtree(tree, path):
    """Extract a descendant subtree by '/'-separated path."""
    node = tree
    for key in path.split("/"):
        if not key:
            continue
        node = node[key]
    return node


def replace_subtree(tree, path, subtree):
    """Return a copy of `tree` with the subtree at `path` replaced."""
    keys = [k for k in path.split("/") if k]
    if not keys:
        return subtree

    def rec(node, keys):
        key, rest = keys[0], keys[1:]
        new = dict(node)
        new[key] = rec(node[key], rest) if rest else subtree
        return new

    return rec(tree, keys)


def path_mask(tree, predicate):
    """Build a boolean pytree mask: predicate('/'.join(path)) per leaf."""

    def to_str(path):
        parts = []
        for p in path:
            if isinstance(p, jax.tree_util.DictKey):
                parts.append(str(p.key))
            elif isinstance(p, jax.tree_util.SequenceKey):
                parts.append(str(p.idx))
            elif isinstance(p, jax.tree_util.GetAttrKey):
                parts.append(str(p.name))
            else:
                parts.append(str(p))
        return "/".join(parts)

    return jax.tree_util.tree_map_with_path(
        lambda path, _: predicate(to_str(path)), tree
    )


def tree_paths(tree):
    """List '/'-joined paths of all leaves."""
    paths = []

    def to_str(path):
        parts = []
        for p in path:
            if isinstance(p, jax.tree_util.DictKey):
                parts.append(str(p.key))
            elif isinstance(p, jax.tree_util.SequenceKey):
                parts.append(str(p.idx))
            else:
                parts.append(str(getattr(p, "name", p)))
        return "/".join(parts)

    for path, _ in jax.tree_util.tree_flatten_with_path(tree)[0]:
        paths.append(to_str(path))
    return paths

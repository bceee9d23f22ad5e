"""Public-API parity: every name the reference exports must exist here.

The reference's ``imops/__init__.py`` is PARSED (not imported — its compiled
extensions aren't built in this container); every public exported name must
resolve on ``imops_spark`` with the same callable/class nature, so a user's
``from imops import X`` rewrites to ``from imops_spark import X`` verbatim.
"""

import ast


REF_INIT = "/root/reference/imops/__init__.py"

# names that are deliberately not mirrored, with the reason
# __version__: our package carries its own; _zoom: private helper
# (leading underscore), documented internal
EXEMPT = {"__version__", "_zoom"}


def _reference_exports():
    tree = ast.parse(open(REF_INIT).read())
    names = []
    for node in ast.walk(tree):
        if isinstance(node, ast.ImportFrom):
            for alias in node.names:
                names.append(alias.asname or alias.name)
    return [n for n in names if n not in EXEMPT and not n.startswith("_")]


def test_every_reference_export_resolves():
    import imops_spark as im

    missing = [n for n in _reference_exports() if not hasattr(im, n)]
    assert not missing, f"reference exports without a counterpart: {missing}"


def test_extended_public_surface_resolves():
    """The documented extras (reference docs/index.md) + additive surface."""
    import imops_spark as im

    for n in (
        "center_of_mass", "distance_transform_edt", "convex_hull_image",
        "isin", "mask_to_box", "Linear2DInterpolator", "TensorFrame",
        "encode_volume", "decode_volume", "get_spark",
    ):
        assert hasattr(im, n), n

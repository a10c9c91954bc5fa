"""Foreign-content (SVG / MathML) tables from the WHATWG spec
("rules for parsing tokens in foreign content"): tag-name and
attribute case adjustment, the HTML-breakout start-tag list, and the
integration-point sets. The reference gets these from html5ever's
tree builder; we re-implement the published spec tables.
"""

from __future__ import annotations

# SVG tag-name adjustment (lowercased tokenizer output → proper case)
SVG_TAG_ADJUST = {n.lower(): n for n in [
    "altGlyph", "altGlyphDef", "altGlyphItem", "animateColor",
    "animateMotion", "animateTransform", "clipPath", "feBlend",
    "feColorMatrix", "feComponentTransfer", "feComposite",
    "feConvolveMatrix", "feDiffuseLighting", "feDisplacementMap",
    "feDistantLight", "feDropShadow", "feFlood", "feFuncA", "feFuncB",
    "feFuncG", "feFuncR", "feGaussianBlur", "feImage", "feMerge",
    "feMergeNode", "feMorphology", "feOffset", "fePointLight",
    "feSpecularLighting", "feSpotLight", "feTile", "feTurbulence",
    "foreignObject", "glyphRef", "linearGradient", "radialGradient",
    "textPath",
]}

# SVG attribute adjustment
SVG_ATTR_ADJUST = {n.lower(): n for n in [
    "attributeName", "attributeType", "baseFrequency", "baseProfile",
    "calcMode", "clipPathUnits", "contentScriptType", "contentStyleType",
    "diffuseConstant", "edgeMode", "externalResourcesRequired",
    "filterRes", "filterUnits", "glyphRef", "gradientTransform",
    "gradientUnits", "kernelMatrix", "kernelUnitLength", "keyPoints",
    "keySplines", "keyTimes", "lengthAdjust", "limitingConeAngle",
    "markerHeight", "markerUnits", "markerWidth", "maskContentUnits",
    "maskUnits", "numOctaves", "pathLength", "patternContentUnits",
    "patternTransform", "patternUnits", "pointsAtX", "pointsAtY",
    "pointsAtZ", "preserveAlpha", "preserveAspectRatio",
    "primitiveUnits", "refX", "refY", "repeatCount", "repeatDur",
    "requiredExtensions", "requiredFeatures", "specularConstant",
    "specularExponent", "spreadMethod", "startOffset", "stdDeviation",
    "stitchTiles", "surfaceScale", "systemLanguage", "tableValues",
    "targetX", "targetY", "textLength", "viewBox", "viewTarget",
    "xChannelSelector", "yChannelSelector", "zoomAndPan",
]}

# MathML attribute adjustment
MATHML_ATTR_ADJUST = {"definitionurl": "definitionURL"}

# HTML start tags that break out of foreign content
BREAKOUT = frozenset("""
b big blockquote body br center code dd div dl dt em embed h1 h2 h3 h4
h5 h6 head hr i img li listing menu meta nobr ol p pre ruby s small
span strong strike sub sup table tt u ul var
""".split())

# MathML text integration points (children parse as HTML except
# mglyph/malignmark)
MATHML_TEXT_IP = frozenset(["mi", "mo", "mn", "ms", "mtext"])

# SVG HTML integration points
SVG_HTML_IP = frozenset(["foreignobject", "desc", "title"])


def adjust_svg_tag(name: str) -> str:
    return SVG_TAG_ADJUST.get(name, name)


def adjust_foreign_attrs(attrs: list[list[str]], ns: str) -> list[list[str]]:
    """In-place case adjustment of attribute names for the given
    namespace ('svg' or 'math'). Qualified foreign attributes
    (xlink:/xml:/xmlns:) are already stored with their prefix."""
    table = SVG_ATTR_ADJUST if ns == "svg" else MATHML_ATTR_ADJUST
    for a in attrs:
        adj = table.get(a[0])
        if adj is not None:
            a[0] = adj
    return attrs


def font_breaks_out(attrs: list[list[str]]) -> bool:
    """<font> breaks out of foreign content only with one of the
    HTML-ish presentational attributes."""
    return any(a[0] in ("color", "face", "size") for a in attrs)

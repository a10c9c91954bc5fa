"""Pure-Python WHATWG HTML kernel (runs inside Arrow UDF batches)."""

from nipper_spark.html.arena import Arena  # noqa: F401
from nipper_spark.html.document import Document, Selection  # noqa: F401
from nipper_spark.html.selector import Matcher, SelectorError  # noqa: F401
from nipper_spark.html.serializer import serialize  # noqa: F401
from nipper_spark.html.treebuilder import parse_document, parse_fragment  # noqa: F401

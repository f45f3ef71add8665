"""Driver-side planning: stats sampling + codec auto-selection.

The analog of the reference's compile step ``Parser::new`` = validate config +
build the path trie once, then apply mechanically per document
(/root/reference/src/xml_parser.rs:763-784). Here: sample the table once,
resolve every ``auto`` policy to a concrete codec, broadcast the resolved
manifest to executors.
"""

from xml2arrow_spark.plans.selector import (
    choose_int_codec,
    choose_str_codec,
    estimate_int_sizes,
    resolve_manifest,
)

__all__ = [
    "choose_int_codec",
    "choose_str_codec",
    "estimate_int_sizes",
    "resolve_manifest",
]

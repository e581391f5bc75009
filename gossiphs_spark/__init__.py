"""gossiphs_spark — a PySpark-native knowledge-graph construction engine.

A from-scratch re-expression of the query/data-processing capabilities of
williamfzc/gossiphs (reference: /root/reference, Rust), generalized from
code-file def/ref symbol linking to web-text knowledge-graph construction:

    pages(url, warc_ts, html, text, lang)
      -> extraction (Arrow-batched mapInPandas)        [ref src/extractor.rs:53-301]
      -> mentions (DEF/REF/IMPORT/NAMESPACE)           [ref src/symbol.rs:15-35]
      -> pointless-symbol semi-join filter             [ref src/graph.rs:370-403]
      -> candidate linking (exact + base-name joins)   [ref src/graph.rs:620-645]
      -> IDF x decayed-Jaccard x physical-evidence scoring
                                                       [ref src/graph.rs:651-707]
      -> entropy/z-score + knee-cutoff pruning         [ref src/graph.rs:710-795]
      -> node/edge graph tables + read API             [ref src/api.rs:219-448]

Everything is declarative DataFrame algebra planned by Catalyst; Python
touches data only through Arrow-batched pandas UDFs (extraction), never
row-at-a-time.
"""

from gossiphs_spark.config import PipelineConfig
from gossiphs_spark.session import get_spark

__all__ = ["PipelineConfig", "get_spark"]
__version__ = "0.1.0"

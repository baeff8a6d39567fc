from .registry import QUERIES, Query, query, spark_queries, oracle_map  # noqa: F401

# Importing the modules populates the registry. The registry order is
# the natural registration (import) order — deliberately NOT curated:
# the external correctness harness samples a window of entries, and a
# hand-picked window would hide regressions in the unsampled queries.
# Every oracle-backed query is additionally verified locally by
# tests/test_oracle.py across the full registry, regardless of order.
from . import reference_queries  # noqa: F401,E402
from . import text_queries       # noqa: F401,E402
from . import vector_queries     # noqa: F401,E402
from . import event_queries      # noqa: F401,E402
from . import sketch_queries     # noqa: F401,E402
from . import multimodal_queries # noqa: F401,E402
from . import sql_surface_queries # noqa: F401,E402
from . import analytic_queries   # noqa: F401,E402
from . import multiway_queries   # noqa: F401,E402
from . import correlated_queries # noqa: F401,E402
from . import sampling_queries   # noqa: F401,E402
from . import chunking_queries   # noqa: F401,E402
from . import packing_queries    # noqa: F401,E402
from . import stats_queries      # noqa: F401,E402
from . import curation_queries   # noqa: F401,E402
from . import pipeline_queries   # noqa: F401,E402
from . import retrieval_queries  # noqa: F401,E402
from . import funnel_queries     # noqa: F401,E402
from . import streaming_queries  # noqa: F401,E402
from . import graph_queries      # noqa: F401,E402
from . import bpe_queries        # noqa: F401,E402
from . import variant_queries    # noqa: F401,E402
from . import linkgraph_queries  # noqa: F401,E402
from . import dsir_queries       # noqa: F401,E402
from . import corpus_report_queries  # noqa: F401,E402
from . import tableformat_queries   # noqa: F401,E402
from . import projection_queries    # noqa: F401,E402
from . import udaf_queries          # noqa: F401,E402
from . import verdict_queries       # noqa: F401,E402
from . import setsim_queries        # noqa: F401,E402
from . import mining_queries        # noqa: F401,E402
from . import streamgate_queries    # noqa: F401,E402

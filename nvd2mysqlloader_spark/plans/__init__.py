from .registry import QUERIES, Query, query, spark_queries, oracle_map  # noqa: F401

# importing the modules populates the registry
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

from geoglue_ray.sources.admin import AdminIndex, build_admin_table  # noqa: F401
from geoglue_ray.sources.corpus import (  # noqa: F401
    DeriveObservations,
    read_corpus,
    read_documents,
)
from geoglue_ray.sources.weights import build_weights_grid, build_weights_table  # noqa: F401

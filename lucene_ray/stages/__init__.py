"""Reusable map_batches stages (actor-pool callables and batch transforms).

Canonical implementations live next to their domains; re-exported here so
the stages/ namespace of the build plan maps to real code.
"""

from ..pipelines.multimodal import FeatureExtractor, _attach_payload as attach_payload  # noqa: F401
from ..sources.transcripts import doc_batch_to_transcripts  # noqa: F401

"""Persistent / shared state: commit points, lineage manifests, integrity."""

from ..index.check import check_index  # noqa: F401
from ..index.manifest import commit_index, committed_shards, fingerprint, latest_commit  # noqa: F401

from .admin import (pending_instants, unschedule_pending,
                    validate_compaction_plan, validate_pending)
from .clean import CleaningPolicy, clean
from .cluster import cluster, rescale_buckets
from .compact import compact, logcompact, schedule_compaction
from .rollback import restore, rollback, rollback_failed_writes, savepoint
from .archive import archive
from .repair import find_duplicates, repair_deduplicate
from .ttl import apply_ttl, expired_partitions
from .upgrade import CURRENT_VERSION, downgrade, upgrade

__all__ = ["clean", "CleaningPolicy", "cluster", "rescale_buckets",
           "compact", "logcompact",
           "schedule_compaction", "rollback", "rollback_failed_writes",
           "restore", "savepoint",
           "archive", "find_duplicates", "repair_deduplicate",
           "upgrade", "downgrade", "CURRENT_VERSION",
           "apply_ttl", "expired_partitions",
           "pending_instants", "validate_pending",
           "validate_compaction_plan", "unschedule_pending"]

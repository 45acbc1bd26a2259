"""Timeline archival (HoodieTimelineArchiveLog.java:72-194): fold completed
instants beyond the active window into one JSON-lines file. Savepointed
instants stay active (same protection as the reference's archiver)."""

from __future__ import annotations

from .rollback import savepointed_instants


def archive(table, max_active: int | None = None) -> int:
    max_active = max_active or table.write_config.max_commits_to_keep
    return table.timeline.archive(max_active,
                                  protected=savepointed_instants(table))

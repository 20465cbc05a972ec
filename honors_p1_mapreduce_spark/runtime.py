"""Job status / progress surface (SURVEY.md §2.2 R6).

The reference exposes ``GetJobStatus`` -> ``{status, map_progress,
reduce_progress, totals}`` polled by the client
(mr/coordinator/server.py:116-137, mr/client/client.py:87-118). Spark
tracks the same information per stage in its status tracker; this is
the thin read-only wrapper over it — stages are the map/reduce-phase
analog (one stage per shuffle side).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import SparkSession


def status(spark: SparkSession) -> dict[str, Any]:
    """Snapshot of active jobs with per-stage task progress counters.

    Shape mirrors the reference's reply: overall status plus
    ``{completed}/{total}`` per phase (here: per stage).
    """
    tracker = spark.sparkContext.statusTracker()
    jobs = []
    for job_id in tracker.getActiveJobsIds():
        info = tracker.getJobInfo(job_id)
        if info is None:
            continue
        stages = []
        for sid in info.stageIds:
            s = tracker.getStageInfo(sid)
            if s is None:
                continue
            stages.append(
                {
                    "stage_id": sid,
                    "name": s.name,
                    "total_tasks": s.numTasks,
                    "active_tasks": s.numActiveTasks,
                    "completed_tasks": s.numCompletedTasks,
                    "failed_tasks": s.numFailedTasks,
                    "progress": (s.numCompletedTasks / s.numTasks) if s.numTasks else 1.0,
                }
            )
        jobs.append({"job_id": job_id, "status": info.status, "stages": stages})
    return {"status": "RUNNING" if jobs else "IDLE", "active_jobs": jobs}

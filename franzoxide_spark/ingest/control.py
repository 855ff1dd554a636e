"""EP2 control plane: GetConfig / UpdateConfig / GetStatus, transport-free.

The reference implements GetConfig for real (service.rs:337-365) but
UpdateConfig and GetStatus are ``unimplemented!()`` panics
(service.rs:368-381, 384-421). The Spark shim makes all three real —
same pattern as the Tier-B features — by bridging to the engine's actual
state:

- GetConfig    -> ``Config.connector(name)`` (A24), mirrored to the proto
  ConnectorConfig shape the reference returns.
- UpdateConfig -> ``ConnectorManager.restart(name, new_options)`` (B14):
  the declared-but-panicking RPC becomes a checkpoint-preserving restart.
- GetStatus    -> ``ConnectorManager.status()`` (A25/B15) mapped onto the
  proto state enum: RUNNING->RUNNING, STOPPED->PAUSED (stop+checkpoint-
  resume is the Spark pause, B16), FAILED->FAILED,
  UNINITIALIZED->UNASSIGNED. ``tasks`` mirrors the reference's intended
  per-task fan-out (service.rs:407-417): one entry per tasks_max.

Errors follow the reference's gRPC status choices (NOT_FOUND for unknown
connectors, INVALID_ARGUMENT for a missing config member); transport-free
callers get them as ``KeyError``/``ValueError`` which the gRPC adapter
maps back onto grpc status codes.
"""

from __future__ import annotations

from franzoxide_spark.errors import ConfigError
from franzoxide_spark.ingest import protowire as pw
from franzoxide_spark.manager import ConnectorManager, ConnectorState

_STATE_MAP = {
    ConnectorState.UNINITIALIZED: pw.STATE_UNASSIGNED,
    ConnectorState.RUNNING: pw.STATE_RUNNING,
    ConnectorState.STOPPED: pw.STATE_PAUSED,
    ConnectorState.FAILED: pw.STATE_FAILED,
}


class ControlPlaneHandler:
    def __init__(self, manager: ConnectorManager):
        self.manager = manager

    def get_config(self, req: pw.ConfigRequest) -> pw.ConfigResponse:
        try:
            c = self.manager.config.connector(req.connector_name)
        except ConfigError:
            raise KeyError(f"Connector not found: {req.connector_name}")
        return pw.ConfigResponse(
            config=pw.ConnectorConfigMsg(
                connector_class=c.connector_class,
                name=c.name,
                config=dict(c.config),
                tasks_max=c.tasks_max,
            )
        )

    def update_config(self, req: pw.ConfigUpdateRequest) -> pw.ConfigResponse:
        if req.config is None:
            raise ValueError("Missing connector configuration")
        # missing connector -> NOT_FOUND; a ConfigError from validating
        # the NEW options is an INVALID_ARGUMENT, not "not found" — the
        # old blanket mapping hid real config errors behind a misleading
        # NOT_FOUND for a connector that exists (r13 review)
        try:
            self.manager.config.connector(req.config.name)
        except ConfigError:
            raise KeyError(f"Connector not found: {req.config.name}")
        try:
            self.manager.restart(req.config.name, dict(req.config.config))
        except ConfigError as e:
            raise ValueError(str(e))
        return self.get_config(pw.ConfigRequest(connector_name=req.config.name))

    def get_status(self, req: pw.StatusRequest) -> pw.StatusResponse:
        try:
            c = self.manager.config.connector(req.connector_name)
        except ConfigError:
            raise KeyError(f"Connector not found: {req.connector_name}")
        # live health, not the start-time snapshot: a crashed query must
        # surface as FAILED here, not RUNNING forever (r13 review)
        state = _STATE_MAP[self.manager.connector_state(c.name)]
        return pw.StatusResponse(
            state=state,
            worker_id="spark-driver",
            tasks=[
                pw.TaskStatus(
                    task_id=i, state=state, worker_id=f"spark-driver-task-{i}"
                )
                for i in range(max(c.tasks_max, 1))
            ],
        )

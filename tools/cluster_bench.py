"""N vs 4N EXECUTOR scaling on a real local standalone cluster.

The north rule demands throughput scaling efficiency >= 0.8 from N to
4N executors under spark-submit on a multi-executor cluster.  This
sandbox has one 32-core VM, so the cluster is emulated faithfully at
process level rather than by local-mode thread caps:

- a standalone Master (java, from the pyspark jars),
- N=1 or N=4 Worker daemons, EACH pinned with ``taskset`` to its own
  disjoint 8-core range and offering exactly 8 cores — so one executor
  JVM + its python workers per 8 physical cores, like a real cluster
  node (executor JVMs and python workers inherit the worker's CPU
  affinity),
- the workload submitted via ``spark-submit --master spark://...
  --py-files engine.zip jobs/scaling_job.py`` — the exact deployment
  surface BASELINE.json north_star names.

Compared to the local[8]-vs-local[32] proxy this adds real executor
isolation (separate JVM heaps + GC, per-executor shuffle dirs, real
netty shuffle between executors) and removes the single-shared-JVM
contention asymmetry.  What it CANNOT remove: co-tenant steal on the
shared VM and the all-core turbo-frequency drop (8 busy cores clock
higher than 32) — both absent on a real isolated cluster, both
documented in BENCH/BASELINE.md.

Usage:
  python tools/cluster_bench.py --rows 8000000            # gen + both levels
  python tools/cluster_bench.py --input-dir DIR --levels 4  # reuse input
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import shutil
import subprocess
import sys
import tempfile
import time
import zipfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    import socket

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _pyspark_home() -> str:
    """Spark home for daemons + spark-submit: prefer a full distro
    (SPARK_HOME, e.g. /opt/spark) over the pip pyspark layout."""
    sh = os.environ.get("SPARK_HOME")
    if sh and os.path.isdir(os.path.join(sh, "jars")):
        return sh
    import pyspark

    return os.path.dirname(pyspark.__file__)


def _java() -> str:
    jh = os.environ.get("JAVA_HOME")
    return os.path.join(jh, "bin", "java") if jh else "java"


def _spark_class(cls: str, args: list[str], taskset: "str | None",
                 env_extra: dict) -> subprocess.Popen:
    cp = os.path.join(_pyspark_home(), "jars", "*")
    cmd = [_java(), "-Xmx1g", "-cp", cp, cls] + args
    if taskset and shutil.which("taskset"):
        cmd = ["taskset", "-c", taskset] + cmd
    env = dict(os.environ)
    env.update(env_extra)
    env.setdefault("SPARK_NO_DAEMONIZE", "1")
    # the Worker's ExecutorRunner rebuilds the executor launch command
    # from SPARK_HOME ("Cannot find any build directories" without it);
    # the pip pyspark layout lacks the source-tree build dirs the
    # launcher probes for Scala version, so pin it explicitly
    env.setdefault("SPARK_HOME", _pyspark_home())
    env.setdefault("SPARK_SCALA_VERSION", "2.13")
    log = open(os.path.join(tempfile.gettempdir(),
                             f"spark_daemon_{cls.rsplit('.', 1)[-1]}_{len(args)}_{os.getpid()}_{time.time_ns() % 100000}.log"), "w")
    return subprocess.Popen(cmd, stdout=log, stderr=subprocess.STDOUT, env=env)


def make_engine_zip(out_dir: str) -> str:
    """Package the engine for --py-files (the deployment artifact)."""
    zpath = os.path.join(out_dir, "engine.zip")
    pkg = os.path.join(REPO, "pulsarfeatureextractor_spark")
    with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as z:
        for path in glob.glob(os.path.join(pkg, "**", "*.py"), recursive=True):
            z.write(path, os.path.relpath(path, REPO))
    return zpath


class Cluster:
    """A pinned standalone cluster: master + n_workers x 8-core workers.

    Every instance binds its own free master/webui ports so concurrent
    harnesses can never cross-register workers (a shared well-known
    port once silently merged two clusters into one 64-core pool)."""

    def __init__(self, n_workers: int, cores_per_worker: int = 8,
                 worker_memory: str = "14g"):
        self.procs: list[subprocess.Popen] = []
        self.n_workers = n_workers
        self.cores = cores_per_worker
        self.worker_memory = worker_memory
        self.master_url = ""

    def __enter__(self):
        port = _free_port()
        self.master_url = f"spark://127.0.0.1:{port}"
        self.procs.append(_spark_class(
            "org.apache.spark.deploy.master.Master",
            ["--host", "127.0.0.1", "--port", str(port),
             "--webui-port", str(_free_port())],
            taskset=None, env_extra={}))
        time.sleep(2.0)
        for i in range(self.n_workers):
            lo = i * self.cores
            hi = lo + self.cores - 1
            work_dir = f"/dev/shm/spark_worker_{port}_{i}" if os.path.isdir("/dev/shm") \
                else tempfile.mkdtemp(prefix=f"spark_worker_{i}_")
            os.makedirs(work_dir, exist_ok=True)
            self.procs.append(_spark_class(
                "org.apache.spark.deploy.worker.Worker",
                ["--host", "127.0.0.1", "--cores", str(self.cores),
                 "--memory", self.worker_memory, "--work-dir", work_dir,
                 "--webui-port", str(_free_port()), self.master_url],
                taskset=f"{lo}-{hi}",
                env_extra={"SPARK_LOCAL_DIRS": work_dir}))
        time.sleep(3.0)
        return self

    def __exit__(self, *exc):
        for p in reversed(self.procs):
            p.terminate()
        for p in self.procs:
            try:
                p.wait(timeout=10)
            except subprocess.TimeoutExpired:
                p.kill()
        return False


def submit(input_dir: str, zip_path: str, total_cores: int, runs: int,
           extra_confs: "list[str] | None" = None,
           master_url: str = "",
           job_args: "list[str] | None" = None,
           executor_cores: int = 8,
           executor_memory: str = "10g") -> dict:
    spark_submit = os.path.join(_pyspark_home(), "bin", "spark-submit")
    cmd = [
        spark_submit, "--master", master_url,
        "--deploy-mode", "client",
        "--py-files", zip_path,
        "--conf", f"spark.executor.cores={executor_cores}",
        "--conf", f"spark.executor.memory={executor_memory}",
        "--conf", f"spark.sql.shuffle.partitions={max(total_cores, 8)}",
        "--conf", "spark.sql.files.maxPartitionBytes=8388608",
        "--conf", "spark.ui.enabled=false",
        "--conf", "spark.scheduler.minRegisteredResourcesRatio=1.0",
        "--conf", "spark.scheduler.maxRegisteredResourcesWaitingTime=60s",
    ]
    for c in extra_confs or []:
        cmd += ["--conf", c]
    cmd += [
        os.path.join(REPO, "jobs", "scaling_job.py"),
        "--input", input_dir, "--runs", str(runs), "--master", master_url,
        "--shuffle-partitions", str(max(total_cores, 8)),
    ] + (job_args or [])
    proc = subprocess.run(cmd, capture_output=True, text=True, timeout=1800)
    lines = [ln for ln in proc.stdout.strip().splitlines() if ln.startswith("{")]
    if not lines:
        raise RuntimeError(f"submit failed:\n{proc.stdout[-2000:]}\n{proc.stderr[-2000:]}")
    return json.loads(lines[-1])


def run_level(n_workers: int, input_dir: str, zip_path: str, runs: int) -> dict:
    with Cluster(n_workers) as c:
        out = submit(input_dir, zip_path, n_workers * 8, runs,
                     master_url=c.master_url)
    out["n_executors"] = n_workers
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=8_000_000)
    ap.add_argument("--input-dir", default="")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--levels", default="1,4",
                    help="comma list of worker counts to run")
    args = ap.parse_args()

    input_dir = args.input_dir
    if not input_dir:
        from bench import _gen_input
        from pulsarfeatureextractor_spark.session import get_spark

        input_dir = tempfile.mkdtemp(prefix="cluster_bench_input_")
        gen = get_spark(master="local[32]", app_name="cluster-gen")
        gw = gen.sparkContext._gateway
        _gen_input(gen, args.rows, input_dir)
        gen.stop()
        proc = getattr(gw, "proc", None)
        if proc is not None:
            try:
                proc.terminate()
            except Exception:
                pass

    staging = tempfile.mkdtemp(prefix="cluster_bench_zip_")
    zip_path = make_engine_zip(staging)

    results = {}
    for n in [int(x) for x in args.levels.split(",")]:
        results[f"executors_{n}"] = run_level(n, input_dir, zip_path, args.runs)

    out = {"metric": "scaling_efficiency_1_to_4_executors",
           "unit": "ratio", "input_dir": input_dir, "detail": results}
    if "executors_1" in results and "executors_4" in results:
        r1 = results["executors_1"]["rows_per_sec"]
        r4 = results["executors_4"]["rows_per_sec"]
        out["value"] = round(r4 / (4 * r1), 3)
        out["queries"] = {"exec1_rows_per_sec": r1, "exec4_rows_per_sec": r4}
    print(json.dumps(out))


if __name__ == "__main__":
    main()

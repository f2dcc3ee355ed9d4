#!/usr/bin/env python3
"""Measure the reference pipeline's wall time by RUNNING ITS OWN CODE.

The reference (/root/reference, Moisescar3008/Calidad-del-aire-etl) is a
pandas/Airflow DAG whose README claims "~2-5 minutes per execution" at
its native volume (5 stations x 90 days x 24 h = 10,800 rows). BASELINE.md
should rest on a measurement, not a README sentence, so this harness:

  1. stubs the airflow modules (DAG/operators/hooks) just enough for
     `airflow_dag_calidad_aire.py` to import — NO reference code is
     copied anywhere; the module runs verbatim from /root/reference;
  2. times each task callable (extract -> transform -> load -> validate)
     through a fake TaskInstance whose XCom is a dict, exactly the data
     flow the DAG wires;
  3. re-times transform/load/validate on a 16x raw input (80 stations:
     the native 5-station raw CSV replicated with suffixed station
     names — scaling code is ours, the pipeline code is theirs), the
     volume graft's sf0.1 twin (etl.AirQualityPipeline, BaselineTwin
     main) runs at.

Usage: python3 tools/measure_baseline.py
Output: one JSON line with the measured seconds per stage and volume.
"""
import json
import os
import sys
import time
import types


def _stub_airflow():
    """Install import-time stand-ins for the airflow surface the DAG
    file touches at module scope (DAG ctor, operator ctors)."""
    def mod(name):
        m = types.ModuleType(name)
        sys.modules[name] = m
        return m

    class _Anything:
        def __init__(self, *a, **k):
            pass

        def __rshift__(self, other):  # task chaining: t1 >> t2
            return other

        def __lshift__(self, other):
            return other

    airflow = mod("airflow")
    airflow.DAG = _Anything
    mod("airflow.operators")
    mod("airflow.operators.python").PythonOperator = _Anything
    mod("airflow.providers")
    mod("airflow.providers.postgres")
    mod("airflow.providers.postgres.operators")
    mod("airflow.providers.postgres.operators.postgres").PostgresOperator = _Anything
    mod("airflow.providers.postgres.hooks")
    mod("airflow.providers.postgres.hooks.postgres").PostgresHook = _Anything


class FakeTI:
    """Dict-backed XCom: the only TaskInstance surface the DAG uses."""

    def __init__(self):
        self.store = {}

    def xcom_push(self, key, value):
        self.store[key] = value

    def xcom_pull(self, task_ids=None, key=None):
        return self.store.get(key)


def time_stage(fn, ctx):
    t0 = time.time()
    fn(ti=ctx["ti"])
    return round(time.time() - t0, 2)


def main():
    _stub_airflow()
    sys.path.insert(0, "/root/reference/dags")
    import airflow_dag_calidad_aire as ref  # noqa: E402  (runs verbatim)

    import pandas as pd  # the reference's own dependency set

    out = {"box_cpus": os.cpu_count()}

    # ---- native volume: the DAG exactly as shipped -------------------
    ctx = {"ti": FakeTI()}
    out["native_extract_sec"] = time_stage(ref.extract_air_quality_data, ctx)
    out["native_rows"] = ctx["ti"].store["total_records"]
    out["native_transform_sec"] = time_stage(ref.transform_air_quality_data, ctx)
    out["native_load_sec"] = time_stage(ref.load_to_postgres, ctx)
    out["native_validate_sec"] = time_stage(ref.validate_data_quality, ctx)
    out["native_total_sec"] = round(
        out["native_extract_sec"] + out["native_transform_sec"]
        + out["native_load_sec"] + out["native_validate_sec"], 2)

    # ---- 16x volume (sf0.1-equivalent): same pipeline code -----------
    raw = pd.read_csv(ctx["ti"].store["raw_data_path"])
    big = pd.concat(
        [raw.assign(station=raw["station"] + f"_x{i}") for i in range(16)],
        ignore_index=True)
    big_path = "/tmp/air_quality_raw_16x.csv"
    big.to_csv(big_path, index=False)
    ctx16 = {"ti": FakeTI()}
    ctx16["ti"].store["raw_data_path"] = big_path
    out["x16_rows"] = len(big)
    out["x16_transform_sec"] = time_stage(ref.transform_air_quality_data, ctx16)
    out["x16_load_sec"] = time_stage(ref.load_to_postgres, ctx16)
    out["x16_validate_sec"] = time_stage(ref.validate_data_quality, ctx16)
    out["x16_total_sec"] = round(
        out["x16_transform_sec"] + out["x16_load_sec"]
        + out["x16_validate_sec"], 2)

    print(json.dumps(out))


if __name__ == "__main__":
    main()

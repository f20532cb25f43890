"""Generate the deterministic IoT CSV ingestion fixture (FIXTURES.md F-1).

Committed outputs live in tests/data/iot/. Deterministic: seeded RNG, no
timestamps-of-now. Shape mirrors the reference's sample jobs
(/root/reference/input/*.json): PK (DateTime, Sensor_id), ~10% PK dupes,
mixed timestamp formats across the 4 reference defaults, leading whitespace
after some commas, AQI nulls, Remarks mostly empty (and never
timestamp-parseable).
"""

from __future__ import annotations

import random
from datetime import datetime, timedelta
from pathlib import Path

OUT = Path(__file__).resolve().parent.parent / "tests" / "data" / "iot"

FORMATS = ["%y-%m-%d %H:%M:%S", "%y/%m/%d %H:%M:%S",
           "%Y-%m-%d %H:%M:%S", "%Y/%m/%d %H:%M:%S"]

SENSORS = [f"S{i:02d}" for i in range(8)]
REMARKS = ["", "", "", "", "", "calibrated", "sensor reset", "low battery", ""]


def gen_file(path: Path, day: int, rng: random.Random, rows: int = 400) -> None:
    base = datetime(2021, 10, day, 0, 0, 0)
    lines = ["DateTime,Sensor_id,PM25,PM10,AQI,LAT,LONG,Remarks"]
    keys = []
    for i in range(rows):
        # ~10% duplicate PKs: reuse an earlier (ts, sensor) with new measures
        if keys and rng.random() < 0.10:
            ts, sensor = rng.choice(keys)
        else:
            # leave hour 13 empty for every sensor → resample gap (F-1)
            minute = rng.randrange(0, 60)
            hour = rng.choice([h for h in range(24) if h != 13])
            ts = base + timedelta(hours=hour, minutes=minute,
                                  seconds=rng.randrange(0, 60))
            sensor = rng.choice(SENSORS)
            keys.append((ts, sensor))
        fmt = rng.choice(FORMATS)
        pm25 = round(rng.uniform(2, 180), 1)
        pm10 = round(rng.uniform(5, 250), 1)
        aqi = "" if rng.random() < 0.05 else str(rng.randrange(5, 300))
        lat = f"14.{60 + SENSORS.index(sensor)}"
        lon = f"121.{10 + SENSORS.index(sensor)}"
        remark = rng.choice(REMARKS)
        sep = ", " if rng.random() < 0.3 else ","  # exercises skipinitialspace
        lines.append(sep.join([ts.strftime(fmt), sensor, str(pm25), str(pm10),
                               aqi, lat, lon, remark]))
    path.write_text("\n".join(lines) + "\n")


def main() -> None:
    OUT.mkdir(parents=True, exist_ok=True)
    rng = random.Random(42)
    for day in (1, 2, 3):
        gen_file(OUT / f"zone1_airquality_2021100{day}.csv", day, rng)
    print(f"wrote 3 files to {OUT}")


if __name__ == "__main__":
    main()

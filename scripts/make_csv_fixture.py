"""Generate the committed CSV fixture tests/fixtures/sensor_entries.csv.

Deterministic stand-in for the reference's golden fixture
(/root/reference/src/test/resources/entries.csv, described by
FIXTURES.md): 4 sensors x 600 rows at ~200 ms cadence, normal regime
value = +/-uniform(0,100), anomaly bursts value = +/-(100+uniform(0,50)),
no header, CRLF line endings, ts format 'yyyy-MM-dd HH:mm:ss.SSS'.

Run once; the output is committed (regenerating yields identical bytes).
"""

from __future__ import annotations

import pathlib

SENSORS = ["Warehouse 13", "The Forsaken Inn", "Old Mill", "Motel 6"]
ROWS_PER_SENSOR = 2000
BASE_MS = 1509971554528  # 2017-11-06 12:32:34.528 UTC (fixture epoch)


def lcg(seed: int):
    state = seed
    while True:
        state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 64)
        yield state >> 33


def fmt_ts(ms: int) -> str:
    import datetime

    dt = datetime.datetime.fromtimestamp(ms / 1000.0, tz=datetime.timezone.utc)
    return dt.strftime("%Y-%m-%d %H:%M:%S.") + f"{ms % 1000:03d}"


def main() -> None:
    out = pathlib.Path(__file__).resolve().parents[1] / "tests/fixtures/sensor_entries.csv"
    rng = lcg(42)
    lines = []
    for si, sensor in enumerate(SENSORS):
        ms = BASE_MS + si * 50
        in_burst = 0
        for i in range(ROWS_PER_SENSOR):
            r = next(rng)
            if in_burst > 0:
                in_burst -= 1
                anomaly = 1
                mag = 100 + r % 51
            else:
                # ~1% chance to start a burst of 8; the first 250 rows
                # per sensor stay burst-free so the golden first-200
                # window matches the reference's (normal-only) stats
                if r % 100 == 0 and i >= 250:
                    in_burst = 7
                    anomaly = 1
                    mag = 100 + r % 51
                else:
                    anomaly = 0
                    mag = r % 100
            sign = -1 if (r >> 7) % 2 else 1
            value = float(sign * mag)
            lines.append(f"{sensor},{fmt_ts(ms)},{value},{anomaly}")
            ms += 200
    out.write_text("\r\n".join(lines) + "\r\n")
    print(f"wrote {out} ({len(lines)} rows)")


if __name__ == "__main__":
    main()

"""weather-dl configuration-file grammar (pipeline/configfile.py):
the reference's ``*.cfg``/``*.json`` download configs parse with the
same list/MARS-range/subsection semantics and validation set
(weather_dl/download_pipeline/parsers.py:157-487), and feed the
engine's Cartesian fan-out directly."""

from __future__ import annotations

import json

import pytest

from weather_tools_spark.pipeline.configfile import (
    get_subsections,
    parse_config,
    process_config,
)

ERA5_CFG = """
[parameters]
client=cds
dataset=reanalysis-era5-pressure-levels
target_path=gs://bucket/era5/{year}-{month}.nc
partition_keys=
    year
    month

[parameters.alice]
api_key=KKKK1
api_url=https://cds.example/v1

[parameters.bob]
api_key=KKKK2
api_url=https://cds.example/v2

[selection]
product_type=reanalysis
variable=
    u_component_of_wind
    v_component_of_wind
pressure_level=500/850/1000
year=
    2015
    2016
month=01/to/12
time=00/to/18/by/6
"""


def test_lists_ranges_and_subsections():
    cfg = parse_config(ERA5_CFG)
    assert cfg["selection"]["variable"] == [
        "u_component_of_wind", "v_component_of_wind"
    ]
    assert cfg["selection"]["pressure_level"] == ["500", "850", "1000"]
    assert cfg["selection"]["month"] == [f"{m:02d}" for m in range(1, 13)]
    assert cfg["selection"]["time"] == ["00", "06", "12", "18"]
    assert cfg["parameters"]["alice"]["api_key"] == "KKKK1"
    # '/' inside parameters sections is NOT MARS syntax (URL values)
    assert cfg["parameters"]["bob"]["api_url"] == "https://cds.example/v2"


def test_process_config_to_download_config():
    c = process_config(ERA5_CFG, "era5.cfg")
    assert c.name == "era5.cfg"
    assert c.client == "cds" and c.dataset == "reanalysis-era5-pressure-levels"
    assert c.partition_keys == ["year", "month"]
    assert c.selection["year"] == ["2015", "2016"]
    assert len(c.selection["month"]) == 12


def test_positional_template_maps_to_partition_keys():
    c = process_config(ERA5_CFG.replace("{year}-{month}.nc", "{}-{}.nc"))
    assert c.target_template == "gs://bucket/era5/{year}-{month}.nc"


def test_year_month_range_steps_by_months():
    cfg = parse_config("[selection]\nyear-month=2020-11/to/2021-02\n")
    assert cfg["selection"]["year-month"] == [
        "2020-11", "2020-12", "2021-01", "2021-02"
    ]


def test_json_config_same_pipeline():
    j = json.dumps({
        "parameters": {"client": "fake", "target_path": "out/{d}.nc",
                       "partition_keys": "d"},
        "selection": {"d": "2020-01-01/to/2020-01-03"},
    })
    c = process_config(j, "x.json")
    assert c.selection["d"] == ["2020-01-01", "2020-01-02", "2020-01-03"]
    assert c.partition_keys == ["d"]  # single-string key coerced to list


def test_subsections_for_license_cycling():
    assert [s[0] for s in get_subsections(ERA5_CFG)] == ["alice", "bob"]
    assert get_subsections("[parameters]\nclient=fake\ntarget_path=x\n") == [
        ("default", {})
    ]


@pytest.mark.parametrize(
    "text,frag,err",
    [
        ("[parameters]\nclient=cds\n", "target_path", ValueError),
        ("[parameters]\ntarget_path=x\n", "client", ValueError),
        ("[parameters]\nclient=nope\ntarget_path=x\n", "Invalid 'client'", ValueError),
        ("[parameters]\nclient=cds\ntarget_path={a}\npartition_keys=a\n"
         "[selection]\nb=1\n", "partition_keys", ValueError),
        ("[parameters]\nclient=cds\ntarget_path=x\npartition_keys=a\n"
         "[selection]\na=1\n", "replacements", ValueError),
        ("[parameters]\nclient=cds\ntarget_path={day}\npartition_keys=day\n"
         "[selection]\nday=all\n", "cannot appear", ValueError),
        ("[parameters]\nclient=cds\ntarget_path=x.nc\ntarget_template=y\n",
         "deprecated", ValueError),
        ("[parameters]\nclient=cds\ntarget_path=x.nc\nappend_date_dirs=true\n",
         "no longer supported", NotImplementedError),
        ("[parameters]\nclient=cds\ntarget_path=x.nc\ntarget_filename=y\n",
         "no longer supported", NotImplementedError),
        ("not a config at all {{{", "Unable to parse", ValueError),
    ],
)
def test_validation_set(text, frag, err):
    with pytest.raises(err, match=frag.replace("'", "'")[:30].replace("(", "\\(")):
        process_config(text)


def test_hdate_requires_date_partition():
    bad = ("[parameters]\nclient=cds\ntarget_path=x.nc\n"
           "[selection]\nhdate=2020-01-01\n")
    with pytest.raises(ValueError, match="hdate"):
        process_config(bad)
    ok = ("[parameters]\nclient=cds\ntarget_path={date}.nc\npartition_keys=date\n"
          "[selection]\ndate=2020-01-01\nhdate=2019-01-01\n")
    c = process_config(ok)
    assert c.selection["date"] == ["2020-01-01"]  # singleton coerced to list


def test_cfg_drives_fanout(spark):
    from weather_tools_spark.pipeline.partition import fanout

    c = process_config(ERA5_CFG, "era5.cfg")
    parts = fanout(spark, c).orderBy("year", "month").collect()
    assert len(parts) == 24
    assert parts[0].target == "gs://bucket/era5/2015-01.nc"
    assert parts[-1].target == "gs://bucket/era5/2016-12.nc"
    assert parts[0].config_name == "era5.cfg"

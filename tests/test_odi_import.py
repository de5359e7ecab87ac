"""ODI XML-export importer, mirroring the reference's own test suite
(pkg/odi/importer_test.go) behavior for behavior, plus an end-to-end
load of the emitted pipeline."""

import os

import pytest

from bruin_spark.model.odi_import import (
    Project,
    Scenario,
    Step,
    Task,
    generate_assets,
    odi_import,
    variable_macro_body_from_tasks,
    VARIABLE_MACROS_HEADER,
)


def logical_schema_xml(logical: str, physical: str) -> str:
    return f"""<?xml version="1.0" encoding="ISO-8859-1"?>
<SunopsisExport>
  <Object class="com.sunopsis.dwg.dbobj.SnpLschema">
    <Field name="LschemaName" type="java.lang.String"><![CDATA[{logical}]]></Field>
  </Object>
  <Object class="com.sunopsis.dwg.dbobj.SnpFKXRef">
    <Field name="RefKey" type="java.lang.String"><![CDATA[SNP_PSCHEMA.1]]></Field>
    <Field name="RefObjFQName" type="java.lang.String"><![CDATA[Oracle.DWH.DWH.{physical}]]></Field>
  </Object>
</SunopsisExport>"""


TEST_SCENARIO_XML = """<?xml version="1.0" encoding="ISO-8859-1"?>
<SunopsisExport>
  <Object class="com.sunopsis.dwg.dbobj.SnpScen">
    <Field name="ScenName" type="java.lang.String"><![CDATA[PKG_D_LOAN_STG_1]]></Field>
    <Field name="ScenNo" type="com.sunopsis.sql.DbInt"><![CDATA[63]]></Field>
    <Field name="ScenVersion" type="java.lang.String"><![CDATA[001]]></Field>
  </Object>
  <Object class="com.sunopsis.dwg.dbobj.SnpVarScen">
    <Field name="VarName" type="java.lang.String"><![CDATA[GLOBAL.VAR_ETL_DATE]]></Field>
    <Field name="VarDatatype" type="java.lang.String"><![CDATA[N]]></Field>
    <Field name="DefN" type="com.sunopsis.sql.DbInt"><![CDATA[20250818]]></Field>
  </Object>
  <Object class="com.sunopsis.dwg.dbobj.SnpScenStep">
    <Field name="Nno" type="com.sunopsis.sql.DbInt"><![CDATA[2]]></Field>
    <Field name="StepName" type="java.lang.String"><![CDATA[MAP_STG_D_LOAN_1]]></Field>
    <Field name="StepType" type="java.lang.String"><![CDATA[M]]></Field>
    <Field name="TableName" type="java.lang.String"><![CDATA[STG_D_LOAN_1]]></Field>
    <Field name="LschemaName" type="java.lang.String"><![CDATA[LGC_STG]]></Field>
  </Object>
  <Object class="com.sunopsis.dwg.dbobj.SnpScenTask">
    <Field name="Nno" type="com.sunopsis.sql.DbInt"><![CDATA[2]]></Field>
    <Field name="OrdTrt" type="com.sunopsis.sql.DbInt"><![CDATA[80]]></Field>
    <Field name="ScenTaskNo" type="com.sunopsis.sql.DbInt"><![CDATA[80]]></Field>
    <Field name="TaskName1" type="java.lang.String"><![CDATA[Insert new rows]]></Field>
    <Field name="TaskName2" type="java.lang.String"><![CDATA[IKM Oracle]]></Field>
    <Field name="TaskType" type="java.lang.String"><![CDATA[J]]></Field>
    <Field name="DefLschemaName" type="java.lang.String"><![CDATA[LGC_STG]]></Field>
    <Field name="DefTxt" type="java.lang.String"><![CDATA[
insert into <?= odiRef.getObjectName("L", "STG_D_LOAN_1", "LGC_STG", "D") ?>
select *
from <?= odiRef.getObjectName("L", "KREDI", "LGC_TB", "D") ?>
where AC_TAR <= TO_DATE(#GLOBAL.VAR_ETL_DATE,'YYYYMMDD')
    ]]></Field>
  </Object>
  <Object class="com.sunopsis.dwg.dbobj.SnpScenTask">
    <Field name="Nno" type="com.sunopsis.sql.DbInt"><![CDATA[2]]></Field>
    <Field name="OrdTrt" type="com.sunopsis.sql.DbInt"><![CDATA[90]]></Field>
    <Field name="ScenTaskNo" type="com.sunopsis.sql.DbInt"><![CDATA[90]]></Field>
    <Field name="TaskName1" type="java.lang.String"><![CDATA[Start child scenario]]></Field>
    <Field name="TaskType" type="java.lang.String"><![CDATA[S]]></Field>
    <Field name="DefTxt" type="java.lang.String"><![CDATA[OdiStartScen -SCEN_NAME=CHILD -SCEN_VERSION=001]]></Field>
  </Object>
</SunopsisExport>"""


VARIABLE_ONLY_XML = """<?xml version="1.0" encoding="ISO-8859-1"?>
<SunopsisExport>
  <Object class="com.sunopsis.dwg.dbobj.SnpScen">
    <Field name="ScenName" type="java.lang.String"><![CDATA[PKG_VARIABLES]]></Field>
    <Field name="ScenNo" type="com.sunopsis.sql.DbInt"><![CDATA[10]]></Field>
    <Field name="ScenVersion" type="java.lang.String"><![CDATA[001]]></Field>
  </Object>
  <Object class="com.sunopsis.dwg.dbobj.SnpVarScen">
    <Field name="VarName" type="java.lang.String"><![CDATA[GLOBAL.VAR_HIGH_DATE]]></Field>
    <Field name="VarDatatype" type="java.lang.String"><![CDATA[N]]></Field>
    <Field name="DefN" type="com.sunopsis.sql.DbInt"><![CDATA[20991231]]></Field>
  </Object>
  <Object class="com.sunopsis.dwg.dbobj.SnpScenStep">
    <Field name="Nno" type="com.sunopsis.sql.DbInt"><![CDATA[1]]></Field>
    <Field name="StepName" type="java.lang.String"><![CDATA[VAR_HIGH_DATE]]></Field>
    <Field name="StepType" type="java.lang.String"><![CDATA[V]]></Field>
    <Field name="VarName" type="java.lang.String"><![CDATA[GLOBAL.VAR_HIGH_DATE]]></Field>
  </Object>
  <Object class="com.sunopsis.dwg.dbobj.SnpScenTask">
    <Field name="Nno" type="com.sunopsis.sql.DbInt"><![CDATA[1]]></Field>
    <Field name="ScenTaskNo" type="com.sunopsis.sql.DbInt"><![CDATA[2]]></Field>
    <Field name="TaskName1" type="java.lang.String"><![CDATA[Variable]]></Field>
    <Field name="TaskName2" type="java.lang.String"><![CDATA[VAR_HIGH_DATE]]></Field>
    <Field name="TaskType" type="java.lang.String"><![CDATA[V]]></Field>
    <Field name="DefTxt" type="java.lang.String"><![CDATA[SELECT 20991231 FROM DUAL]]></Field>
  </Object>
</SunopsisExport>"""


CONTROL_FLOW_XML = """<?xml version="1.0" encoding="ISO-8859-1"?>
<SunopsisExport>
  <Object class="com.sunopsis.dwg.dbobj.SnpScen">
    <Field name="ScenName" type="java.lang.String"><![CDATA[PKG_CONTROL]]></Field>
    <Field name="ScenNo" type="com.sunopsis.sql.DbInt"><![CDATA[20]]></Field>
    <Field name="ScenVersion" type="java.lang.String"><![CDATA[001]]></Field>
  </Object>
  <Object class="com.sunopsis.dwg.dbobj.SnpScenStep">
    <Field name="Nno" type="com.sunopsis.sql.DbInt"><![CDATA[1]]></Field>
    <Field name="StepName" type="java.lang.String"><![CDATA[MAP_SKIP]]></Field>
    <Field name="StepType" type="java.lang.String"><![CDATA[M]]></Field>
    <Field name="OkNextStep" type="com.sunopsis.sql.DbInt"><![CDATA[3]]></Field>
    <Field name="KoNextStep" type="com.sunopsis.sql.DbInt"><![CDATA[4]]></Field>
  </Object>
  <Object class="com.sunopsis.dwg.dbobj.SnpScenStep">
    <Field name="Nno" type="com.sunopsis.sql.DbInt"><![CDATA[2]]></Field>
    <Field name="StepName" type="java.lang.String"><![CDATA[VAR_COMPARE]]></Field>
    <Field name="StepType" type="java.lang.String"><![CDATA[V]]></Field>
    <Field name="VarName" type="java.lang.String"><![CDATA[GLOBAL.VAR_FLAG]]></Field>
    <Field name="VarOp" type="java.lang.String"><![CDATA[!=]]></Field>
  </Object>
  <Object class="com.sunopsis.dwg.dbobj.SnpScenStep">
    <Field name="Nno" type="com.sunopsis.sql.DbInt"><![CDATA[3]]></Field>
    <Field name="StepName" type="java.lang.String"><![CDATA[MAP_LOOP]]></Field>
    <Field name="StepType" type="java.lang.String"><![CDATA[M]]></Field>
    <Field name="OkNextStep" type="com.sunopsis.sql.DbInt"><![CDATA[1]]></Field>
  </Object>
  <Object class="com.sunopsis.dwg.dbobj.SnpScenStep">
    <Field name="Nno" type="com.sunopsis.sql.DbInt"><![CDATA[4]]></Field>
    <Field name="StepName" type="java.lang.String"><![CDATA[START_CHILD]]></Field>
    <Field name="StepType" type="java.lang.String"><![CDATA[SE]]></Field>
  </Object>
  <Object class="com.sunopsis.dwg.dbobj.SnpScenTask">
    <Field name="Nno" type="com.sunopsis.sql.DbInt"><![CDATA[4]]></Field>
    <Field name="ScenTaskNo" type="com.sunopsis.sql.DbInt"><![CDATA[1]]></Field>
    <Field name="TaskName1" type="java.lang.String"><![CDATA[Oracle Data Integrator Command]]></Field>
    <Field name="TaskType" type="java.lang.String"><![CDATA[S]]></Field>
    <Field name="DefTxt" type="java.lang.String"><![CDATA[OdiStartScen -SCEN_NAME=CHILD -SCEN_VERSION=001]]></Field>
  </Object>
</SunopsisExport>"""


PARENT_XML = """<?xml version="1.0" encoding="ISO-8859-1"?>
<SunopsisExport>
  <Object class="com.sunopsis.dwg.dbobj.SnpScen">
    <Field name="ScenName" type="java.lang.String"><![CDATA[PARENT]]></Field>
    <Field name="ScenNo" type="com.sunopsis.sql.DbInt"><![CDATA[101]]></Field>
    <Field name="ScenVersion" type="java.lang.String"><![CDATA[001]]></Field>
  </Object>
  <Object class="com.sunopsis.dwg.dbobj.SnpScenStep">
    <Field name="Nno" type="com.sunopsis.sql.DbInt"><![CDATA[1]]></Field>
    <Field name="StepName" type="java.lang.String"><![CDATA[START_CHILD]]></Field>
    <Field name="StepType" type="java.lang.String"><![CDATA[SE]]></Field>
  </Object>
  <Object class="com.sunopsis.dwg.dbobj.SnpScenTask">
    <Field name="Nno" type="com.sunopsis.sql.DbInt"><![CDATA[1]]></Field>
    <Field name="OrdTrt" type="com.sunopsis.sql.DbInt"><![CDATA[10]]></Field>
    <Field name="ScenTaskNo" type="com.sunopsis.sql.DbInt"><![CDATA[10]]></Field>
    <Field name="TaskName1" type="java.lang.String"><![CDATA[Oracle Data Integrator Command]]></Field>
    <Field name="TaskType" type="java.lang.String"><![CDATA[S]]></Field>
    <Field name="DefTxt" type="java.lang.String"><![CDATA[OdiStartScen -SCEN_NAME=CHILD -SCEN_VERSION=001]]></Field>
  </Object>
  <Object class="com.sunopsis.dwg.dbobj.SnpScenStep">
    <Field name="Nno" type="com.sunopsis.sql.DbInt"><![CDATA[2]]></Field>
    <Field name="StepName" type="java.lang.String"><![CDATA[MAP_PARENT]]></Field>
    <Field name="StepType" type="java.lang.String"><![CDATA[M]]></Field>
    <Field name="TableName" type="java.lang.String"><![CDATA[PARENT_TARGET]]></Field>
    <Field name="LschemaName" type="java.lang.String"><![CDATA[LGC_STG]]></Field>
  </Object>
  <Object class="com.sunopsis.dwg.dbobj.SnpScenTask">
    <Field name="Nno" type="com.sunopsis.sql.DbInt"><![CDATA[2]]></Field>
    <Field name="OrdTrt" type="com.sunopsis.sql.DbInt"><![CDATA[80]]></Field>
    <Field name="ScenTaskNo" type="com.sunopsis.sql.DbInt"><![CDATA[80]]></Field>
    <Field name="TaskName1" type="java.lang.String"><![CDATA[Insert parent]]></Field>
    <Field name="TaskType" type="java.lang.String"><![CDATA[J]]></Field>
    <Field name="DefLschemaName" type="java.lang.String"><![CDATA[LGC_STG]]></Field>
    <Field name="DefTxt" type="java.lang.String"><![CDATA[
insert into <?= odiRef.getObjectName("L", "PARENT_TARGET", "LGC_STG", "D") ?>
select *
from <?= odiRef.getObjectName("L", "CHILD_TARGET", "LGC_STG", "D") ?>
    ]]></Field>
  </Object>
</SunopsisExport>"""


CHILD_XML = """<?xml version="1.0" encoding="ISO-8859-1"?>
<SunopsisExport>
  <Object class="com.sunopsis.dwg.dbobj.SnpScen">
    <Field name="ScenName" type="java.lang.String"><![CDATA[CHILD]]></Field>
    <Field name="ScenNo" type="com.sunopsis.sql.DbInt"><![CDATA[102]]></Field>
    <Field name="ScenVersion" type="java.lang.String"><![CDATA[001]]></Field>
  </Object>
  <Object class="com.sunopsis.dwg.dbobj.SnpScenStep">
    <Field name="Nno" type="com.sunopsis.sql.DbInt"><![CDATA[1]]></Field>
    <Field name="StepName" type="java.lang.String"><![CDATA[MAP_CHILD]]></Field>
    <Field name="StepType" type="java.lang.String"><![CDATA[M]]></Field>
    <Field name="TableName" type="java.lang.String"><![CDATA[CHILD_TARGET]]></Field>
    <Field name="LschemaName" type="java.lang.String"><![CDATA[LGC_STG]]></Field>
  </Object>
  <Object class="com.sunopsis.dwg.dbobj.SnpScenTask">
    <Field name="Nno" type="com.sunopsis.sql.DbInt"><![CDATA[1]]></Field>
    <Field name="OrdTrt" type="com.sunopsis.sql.DbInt"><![CDATA[80]]></Field>
    <Field name="ScenTaskNo" type="com.sunopsis.sql.DbInt"><![CDATA[80]]></Field>
    <Field name="TaskName1" type="java.lang.String"><![CDATA[Insert child]]></Field>
    <Field name="TaskType" type="java.lang.String"><![CDATA[J]]></Field>
    <Field name="DefLschemaName" type="java.lang.String"><![CDATA[LGC_STG]]></Field>
    <Field name="DefTxt" type="java.lang.String"><![CDATA[
insert into <?= odiRef.getObjectName("L", "CHILD_TARGET", "LGC_STG", "D") ?>
select 1 as id from dual
    ]]></Field>
  </Object>
</SunopsisExport>"""


def _write(d, name, content):
    (d / name).write_text(content, encoding="utf-8")


def test_import_creates_pipeline_sql_asset_macros_and_source_assets(tmp_path):
    src = tmp_path / "odi"
    src.mkdir()
    _write(src, "LSC_LGC_STG.xml", logical_schema_xml("LGC_STG", "STG"))
    _write(src, "LSC_LGC_TB.xml", logical_schema_xml("LGC_TB", "TB"))
    _write(src, "SCEN_TEST.xml", TEST_SCENARIO_XML)
    out = str(tmp_path / "out")

    res = odi_import(str(src), out, connection="oracle-prod")

    assert res.xml_files == 3
    assert res.scenarios == 1
    assert res.sql_assets == 1
    assert res.source_assets == 1
    assert res.variable_macros == 1
    assert res.variable_macros_written and not res.variable_macros_updated
    assert len(res.control_flow_warnings) == 1
    assert res.control_flow_warnings[0].kind == "scenario_call"
    assert res.control_flow_report_written
    assert res.pipeline_created
    assert res.logical_schema_mapping == {"LGC_STG": "STG", "LGC_TB": "TB"}

    pipeline_yaml = open(os.path.join(out, "pipeline.yml")).read()
    assert "name: out" in pipeline_yaml
    assert "oracle: oracle-prod" in pipeline_yaml
    assert "GLOBAL_VAR_ETL_DATE:" in pipeline_yaml
    assert "default: 20250818" in pipeline_yaml

    asset_sql = open(os.path.join(out, "assets", "stg", "stg_d_loan_1.sql")).read()
    assert "name: stg.stg_d_loan_1" in asset_sql
    assert "type: oracle.sql" in asset_sql
    assert "connection: oracle-prod" in asset_sql
    assert "depends:" in asset_sql and "- tb.kredi" in asset_sql
    assert "meta:" in asset_sql and "metadata:" not in asset_sql
    assert '"STG"."STG_D_LOAN_1"' in asset_sql
    assert '"TB"."KREDI"' in asset_sql
    assert "{{ odi_global_var_etl_date() }}" in asset_sql
    assert (
        "-- ODI command: OdiStartScen -SCEN_NAME=CHILD -SCEN_VERSION=001"
        in asset_sql
    )

    macros_sql = open(os.path.join(out, "macros", "odi_variables.sql")).read()
    assert "{% macro odi_global_var_etl_date() -%}" in macros_sql
    assert "{{ var.GLOBAL_VAR_ETL_DATE }}" in macros_sql

    report = open(os.path.join(out, "odi_control_flow_report.yml")).read()
    assert 'kind: "scenario_call"' in report
    assert "OdiStartScen -SCEN_NAME=CHILD -SCEN_VERSION=001" in report

    source_yaml = open(
        os.path.join(out, "assets", "tb", "kredi.asset.yml")
    ).read()
    assert "name: tb.kredi" in source_yaml
    assert "type: oracle.source" in source_yaml
    assert "odi_logical_schema: LGC_TB" in source_yaml


def test_import_skips_existing_assets_unless_overwrite(tmp_path):
    src = tmp_path / "odi"
    src.mkdir()
    _write(src, "LSC_LGC_STG.xml", logical_schema_xml("LGC_STG", "STG"))
    _write(src, "SCEN_TEST.xml", TEST_SCENARIO_XML)
    out = str(tmp_path / "out")

    res = odi_import(str(src), out)
    assert res.sql_assets == 1

    res = odi_import(str(src), out)
    assert res.sql_assets == 0
    assert res.skipped_assets == 2

    res = odi_import(str(src), out, overwrite=True)
    assert res.sql_assets == 1
    assert res.skipped_assets == 0


def test_import_merges_variables_into_existing_pipeline(tmp_path):
    src = tmp_path / "odi"
    src.mkdir()
    _write(src, "SCEN_TEST.xml", TEST_SCENARIO_XML)
    out = tmp_path / "out"
    out.mkdir()
    (out / "pipeline.yml").write_text(
        "name: existing\nvariables:\n  EXISTING_VAR:\n    default: keep-me\n    type: string\n"
    )

    res = odi_import(str(src), str(out))
    assert not res.pipeline_created

    pipeline_yaml = (out / "pipeline.yml").read_text()
    assert "EXISTING_VAR:" in pipeline_yaml
    assert "default: keep-me" in pipeline_yaml
    assert "GLOBAL_VAR_ETL_DATE:" in pipeline_yaml
    assert "default: 20250818" in pipeline_yaml


def test_import_appends_missing_variable_macros(tmp_path):
    src = tmp_path / "odi"
    src.mkdir()
    _write(src, "SCEN_VARIABLE_ONLY.xml", VARIABLE_ONLY_XML)
    out = tmp_path / "out"
    (out / "macros").mkdir(parents=True)
    (out / "macros" / "odi_variables.sql").write_text(
        VARIABLE_MACROS_HEADER + "\n\n{% macro existing_macro() -%}\n1\n{%- endmacro %}\n"
    )

    res = odi_import(str(src), str(out))
    assert res.variable_macros_written and res.variable_macros_updated
    assert not res.variable_macros_skipped

    macros_sql = (out / "macros" / "odi_variables.sql").read_text()
    assert "{% macro existing_macro() -%}" in macros_sql
    assert "{% macro odi_global_var_high_date() -%}" in macros_sql
    assert macros_sql.count(VARIABLE_MACROS_HEADER) == 1

    res = odi_import(str(src), str(out))
    assert not res.variable_macros_written and not res.variable_macros_updated
    assert res.variable_macros_skipped


def test_import_maps_scenario_calls_to_control_assets(tmp_path):
    src = tmp_path / "odi"
    src.mkdir()
    _write(src, "LSC_LGC_STG.xml", logical_schema_xml("LGC_STG", "STG"))
    _write(src, "SCEN_PARENT.xml", PARENT_XML)
    _write(src, "SCEN_CHILD.xml", CHILD_XML)
    out = str(tmp_path / "out")

    res = odi_import(str(src), out)

    assert res.scenarios == 2
    assert res.sql_assets == 2
    assert res.source_assets == 0
    assert res.control_assets == 1
    assert res.scenario_calls_resolved == 1
    assert len(res.control_flow_warnings) == 1
    assert res.control_flow_warnings[0].resolved
    assert res.control_flow_warnings[0].target_scenario == "CHILD"
    assert res.control_flow_warnings[0].target_version == "001"

    call_yaml = open(
        os.path.join(out, "assets", "odi", "parent", "001_start_child_v001_task_10.asset.yml")
    ).read()
    assert "name: odi.parent.001_start_child_v001_task_10" in call_yaml
    assert "type: empty" in call_yaml
    assert "depends:" in call_yaml and "- stg.child_target" in call_yaml
    assert "odi_call_scenario: CHILD" in call_yaml
    assert "odi_call_scenario_version:" in call_yaml

    parent_sql = open(os.path.join(out, "assets", "stg", "parent_target.sql")).read()
    assert "- stg.child_target" in parent_sql
    assert "- odi.parent.001_start_child_v001_task_10" in parent_sql

    report = open(os.path.join(out, "odi_control_flow_report.yml")).read()
    assert "resolved: true" in report
    assert 'target_scenario: "CHILD"' in report
    assert 'target_version: "001"' in report

    # the emitted pipeline LOADS and every dependency resolves
    from bruin_spark.model import load_pipeline

    loaded = load_pipeline(out)
    assert not loaded.load_errors
    names = {a.name for a in loaded.assets}
    for a in loaded.assets:
        for up in a.depends:
            assert up.value in names, f"unresolved dependency {up.value}"


def test_generate_assets_linear_order_and_duplicate_targets():
    project = Project(
        logical_schema_mapping={"LGC_STG": "STG"},
        scenarios=[
            Scenario(
                name="PKG_LINEAR",
                version="001",
                steps=[
                    Step(1, "LOAD_STAGE", "M", "STAGE_TABLE", "LGC_STG"),
                    Step(2, "LOAD_STAGE_AGAIN", "M", "STAGE_TABLE", "LGC_STG"),
                    Step(3, "AUDIT_STAGE", "M", "AUDIT_TABLE", "LGC_STG"),
                ],
                tasks=[
                    Task(step_number=1, task_number=10, order=10, type="J",
                         def_text='insert into <?= odiRef.getObjectName("L", "STAGE_TABLE", "LGC_STG", "D") ?> select 1 from dual'),
                    Task(step_number=2, task_number=20, order=20, type="J",
                         def_text='insert into <?= odiRef.getObjectName("L", "STAGE_TABLE", "LGC_STG", "D") ?> select 2 from dual'),
                    Task(step_number=3, task_number=30, order=30, type="J",
                         def_text='insert into <?= odiRef.getObjectName("L", "AUDIT_TABLE", "LGC_STG", "D") ?> select 1 from dual'),
                ],
            )
        ],
    )
    assets = {a.name: a for a in generate_assets(project, "/out/assets")}
    assert len(assets) == 3
    assert "stg.stage_table" in assets
    assert "odi.pkg_linear.002_load_stage_again" in assets
    assert "stg.audit_table" in assets
    assert assets["stg.stage_table"].path == os.path.join(
        "/out/assets", "stg", "stage_table.sql"
    )
    assert assets["odi.pkg_linear.002_load_stage_again"].path == os.path.join(
        "/out/assets", "odi", "pkg_linear", "002_load_stage_again.sql"
    )
    assert assets["odi.pkg_linear.002_load_stage_again"].meta.get("depends") == [
        "stg.stage_table"
    ]
    assert assets["stg.audit_table"].meta.get("depends") == [
        "odi.pkg_linear.002_load_stage_again"
    ]


def test_generate_assets_keeps_dependency_on_later_target():
    project = Project(
        logical_schema_mapping={"LGC_STG": "STG"},
        scenarios=[
            Scenario(
                name="A_CONSUMER",
                steps=[Step(1, "LOAD_CONSUMER", "M", "CONSUMER_TABLE", "LGC_STG")],
                tasks=[Task(step_number=1, task_number=10, order=10, type="J",
                            def_text='insert into <?= odiRef.getObjectName("L", "CONSUMER_TABLE", "LGC_STG", "D") ?>\n'
                                     'select * from <?= odiRef.getObjectName("L", "FUTURE_TABLE", "LGC_STG", "D") ?>')],
            ),
            Scenario(
                name="B_PRODUCER",
                steps=[Step(1, "LOAD_FUTURE", "M", "FUTURE_TABLE", "LGC_STG")],
                tasks=[Task(step_number=1, task_number=20, order=20, type="J",
                            def_text='insert into <?= odiRef.getObjectName("L", "FUTURE_TABLE", "LGC_STG", "D") ?> select 1 from dual')],
            ),
        ],
    )
    assets = {a.name: a for a in generate_assets(project, "/out/assets")}
    assert len(assets) == 2
    assert assets["stg.consumer_table"].meta.get("depends") == ["stg.future_table"]


def test_import_skips_variable_steps_as_standalone_assets(tmp_path):
    src = tmp_path / "odi"
    src.mkdir()
    _write(src, "SCEN_VARIABLE_ONLY.xml", VARIABLE_ONLY_XML)
    out = str(tmp_path / "out")

    res = odi_import(str(src), out)

    assert res.xml_files == 1 and res.scenarios == 1
    assert res.sql_assets == 0 and res.source_assets == 0
    assert res.variable_macros == 1

    pipeline_yaml = open(os.path.join(out, "pipeline.yml")).read()
    assert "GLOBAL_VAR_HIGH_DATE:" in pipeline_yaml
    assert "default: 20991231" in pipeline_yaml

    assert not os.path.exists(
        os.path.join(out, "assets", "odi", "pkg_variables", "001_var_high_date.sql")
    )

    macros_sql = open(os.path.join(out, "macros", "odi_variables.sql")).read()
    assert "{% macro odi_global_var_high_date() -%}" in macros_sql
    assert "20991231" in macros_sql


def test_variable_macro_body_wraps_lookup_select():
    body = variable_macro_body_from_tasks(
        [Task(def_text="SELECT MAX(CALENDAR_DATE)\nFROM DM.D_CALENDAR\n"
                       "WHERE CALENDAR_DATE <= TO_DATE(#GLOBAL.VAR_ETL_DATE, 'YYYYMMDD')")]
    )
    assert "(SELECT MAX(CALENDAR_DATE)" in body
    assert "FROM DM.D_CALENDAR" in body
    assert "{{ odi_global_var_etl_date() }}" in body


def test_import_reports_non_linear_control_flow(tmp_path):
    src = tmp_path / "odi"
    src.mkdir()
    _write(src, "SCEN_CONTROL.xml", CONTROL_FLOW_XML)
    out = str(tmp_path / "out")

    res = odi_import(str(src), out)

    kinds = sorted(w.kind for w in res.control_flow_warnings)
    assert kinds == sorted(
        ["failure_branch", "success_jump", "loop", "variable_operation", "scenario_call"]
    )
    assert res.control_flow_report_written

    report = open(os.path.join(out, "odi_control_flow_report.yml")).read()
    for kind in ("failure_branch", "success_jump", "loop", "variable_operation", "scenario_call"):
        assert f'kind: "{kind}"' in report


def test_cli_odi_import(tmp_path, capsys):
    from bruin_spark.cli import main

    src = tmp_path / "odi"
    src.mkdir()
    _write(src, "LSC_LGC_STG.xml", logical_schema_xml("LGC_STG", "STG"))
    _write(src, "SCEN_TEST.xml", TEST_SCENARIO_XML)
    out = str(tmp_path / "out")
    rc = main(["import", out, "--odi", str(src), "-c", "oracle-prod"])
    assert rc == 0
    printed = capsys.readouterr().out
    assert "1 SQL assets" in printed
    rc2 = main(["import", out, "--odi", str(tmp_path / "missing")])
    assert rc2 == 2


def test_multi_schema_export_file_records_every_mapping(tmp_path):
    """A consolidated logical-schema export (several SnpLschema objects,
    each followed by its refs) records EVERY logical->physical pair."""
    multi = """<?xml version="1.0" encoding="ISO-8859-1"?>
<SunopsisExport>
  <Object class="com.sunopsis.dwg.dbobj.SnpLschema">
    <Field name="LschemaName" type="java.lang.String"><![CDATA[ORA_TRG]]></Field>
  </Object>
  <Object class="com.sunopsis.dwg.dbobj.SnpFKXRef">
    <Field name="RefKey" type="java.lang.String"><![CDATA[SNP_PSCHEMA.1]]></Field>
    <Field name="RefObjFQName" type="java.lang.String"><![CDATA[Oracle.DWH.DWH.TRG_PROD]]></Field>
  </Object>
  <Object class="com.sunopsis.dwg.dbobj.SnpLschema">
    <Field name="LschemaName" type="java.lang.String"><![CDATA[LGC_DWH]]></Field>
  </Object>
  <Object class="com.sunopsis.dwg.dbobj.SnpFKXRef">
    <Field name="RefKey" type="java.lang.String"><![CDATA[SNP_PSCHEMA.2]]></Field>
    <Field name="RefObjFQName" type="java.lang.String"><![CDATA[Oracle.DWH.DWH.DWH]]></Field>
  </Object>
</SunopsisExport>"""
    src = tmp_path / "odi"
    src.mkdir()
    _write(src, "LSC_MULTI.xml", multi)
    _write(src, "SCEN_TEST.xml", TEST_SCENARIO_XML)
    res = odi_import(str(src), str(tmp_path / "out"))
    assert res.logical_schema_mapping == {"ORA_TRG": "TRG_PROD", "LGC_DWH": "DWH"}


def test_multiple_scenarios_in_one_file_warn(tmp_path):
    doubled = TEST_SCENARIO_XML.replace(
        "</SunopsisExport>",
        """  <Object class="com.sunopsis.dwg.dbobj.SnpScen">
    <Field name="ScenName" type="java.lang.String"><![CDATA[SECOND]]></Field>
    <Field name="ScenVersion" type="java.lang.String"><![CDATA[001]]></Field>
  </Object>
</SunopsisExport>""",
    )
    src = tmp_path / "odi"
    src.mkdir()
    _write(src, "SCEN_DOUBLE.xml", doubled)
    res = odi_import(str(src), str(tmp_path / "out"))
    kinds = [w.kind for w in res.control_flow_warnings]
    assert "multiple_scenarios" in kinds


def test_explicit_zero_default_not_clobbered_by_valueless_declaration(tmp_path):
    """Scenario A sets GLOBAL.VAR_FLAG explicitly to 0; scenario B
    declares the same variable valueless as a string — the explicit
    integer 0 must survive."""
    def scen(name, extra):
        return f"""<?xml version="1.0" encoding="ISO-8859-1"?>
<SunopsisExport>
  <Object class="com.sunopsis.dwg.dbobj.SnpScen">
    <Field name="ScenName" type="java.lang.String"><![CDATA[{name}]]></Field>
    <Field name="ScenVersion" type="java.lang.String"><![CDATA[001]]></Field>
  </Object>
{extra}
</SunopsisExport>"""

    a = scen("A_SCEN", """  <Object class="com.sunopsis.dwg.dbobj.SnpVarScen">
    <Field name="VarName" type="java.lang.String"><![CDATA[GLOBAL.VAR_FLAG]]></Field>
    <Field name="VarDatatype" type="java.lang.String"><![CDATA[N]]></Field>
    <Field name="DefN" type="com.sunopsis.sql.DbInt"><![CDATA[0]]></Field>
  </Object>""")
    b = scen("B_SCEN", """  <Object class="com.sunopsis.dwg.dbobj.SnpVarScen">
    <Field name="VarName" type="java.lang.String"><![CDATA[GLOBAL.VAR_FLAG]]></Field>
    <Field name="VarDatatype" type="java.lang.String"><![CDATA[V]]></Field>
  </Object>""")
    src = tmp_path / "odi"
    src.mkdir()
    _write(src, "SCEN_A.xml", a)
    _write(src, "SCEN_B.xml", b)
    out = tmp_path / "out"
    odi_import(str(src), str(out))
    import yaml as _yaml

    doc = _yaml.safe_load((out / "pipeline.yml").read_text())
    assert doc["variables"]["GLOBAL_VAR_FLAG"] == {"default": 0, "type": "integer"}


def test_cli_odi_malformed_pipeline_yaml_is_clean_error(tmp_path, capsys):
    from bruin_spark.cli import main

    src = tmp_path / "odi"
    src.mkdir()
    _write(src, "SCEN_TEST.xml", TEST_SCENARIO_XML)
    out = tmp_path / "out"
    out.mkdir()
    (out / "pipeline.yml").write_text("name: [unclosed\n  bad: ::::\n\tx")
    rc = main(["import", str(out), "--odi", str(src)])
    assert rc == 2
    assert "ODI import failed" in capsys.readouterr().err

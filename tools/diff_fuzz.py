#!/usr/bin/env python3
"""Differential fuzz: generate random DDL, run the REFERENCE implementation
and compare against graft's batch output (written by `DdlMain <dialect> batch`).

Usage:
  diff_fuzz.py gen <dir> <n> <seed>      # write fuzz_*.sql + reference outputs
  diff_fuzz.py cmp <dir>                 # compare graft outputs against reference
"""
import sys, os, json, random, glob

sys.path.insert(0, '/root/reference')

TYPES = ["SMALLINT", "INTEGER", "INT", "BIGINT", "DECIMAL", "NUMERIC", "REAL",
         "FLOAT", "DOUBLE", "DECFLOAT", "CHAR", "CHARACTER", "VARCHAR",
         "LONG VARCHAR", "CLOB", "GRAPHIC", "VARGRAPHIC", "LONG VARGRAPHIC",
         "DBCLOB", "BINARY", "VARBINARY", "BLOB", "DATE", "TIME", "TIMESTAMP",
         "XML", "ROWID", "BOOLEAN"]
WORDS = ["ORDER", "data", "Value_1", "col", "ITEM", "x9", "Select", "amount",
         "ts_col", "flag"]

def ident(rng):
    base = rng.choice(WORDS) + str(rng.randint(0, 99))
    return f'"{base}"' if rng.random() < 0.15 else base

def column(rng):
    t = rng.choice(TYPES)
    params = ""
    if t in ("DECIMAL", "NUMERIC") and rng.random() < 0.8:
        params = f"({rng.randint(1, 45)},{rng.randint(0, 12)})"
    elif t in ("CHAR", "CHARACTER", "VARCHAR", "CLOB", "BLOB", "BINARY",
               "VARBINARY", "GRAPHIC", "VARGRAPHIC", "DBCLOB") and rng.random() < 0.7:
        params = f"({rng.randint(1, 300000000)})"
    elif t in ("TIME", "TIMESTAMP", "FLOAT", "DECFLOAT") and rng.random() < 0.6:
        params = f"({rng.randint(0, 14)})"
    parts = [ident(rng), t + params]
    if rng.random() < 0.3:
        parts.append("NOT NULL")
    if rng.random() < 0.2:
        parts.append("DEFAULT " + rng.choice(["0", "1", "'abc'", "CURRENT_TIMESTAMP", "'it''s'"]))
    if rng.random() < 0.1:
        parts.append("GENERATED ALWAYS AS IDENTITY")
    if rng.random() < 0.08:
        parts.append("FOR BIT DATA")
    if rng.random() < 0.08:
        parts.append("FIELDPROC PROC" + str(rng.randint(1, 9)))
    if rng.random() < 0.08:
        parts.append("CCSID UNICODE")
    return " ".join(parts)

def table(rng, idx):
    schema = rng.choice(["S1", "APP", "Sales", None])
    name = f"T{idx}_" + rng.choice(["A", "B", "ORD", "data"])
    mod = rng.choice(["", "", "", "VOLATILE ", "GLOBAL TEMPORARY "])
    cols = [column(rng) for _ in range(rng.randint(1, 8))]
    cons = []
    if rng.random() < 0.5:
        cons.append(f"PRIMARY KEY ({ident(rng)})")
    if rng.random() < 0.25:
        cons.append(f"CONSTRAINT FK{idx} FOREIGN KEY (C1) REFERENCES OTHER.T(C2)")
    if rng.random() < 0.2:
        cons.append(f"UNIQUE ({ident(rng)})")
    if rng.random() < 0.15:
        cons.append("CHECK (X > 0 AND Y < 10)")
    body = ",\n  ".join(cols + cons)
    opts = ""
    if rng.random() < 0.2:
        opts += " IN TS" + str(rng.randint(1, 5))
    if rng.random() < 0.1:
        opts += " EDITPROC EDP1"
    if rng.random() < 0.1:
        opts += " VALIDPROC VLP1"
    if rng.random() < 0.15:
        opts += f" PARTITION BY {rng.choice(['RANGE', 'HASH'])} (C1, C2)"
    if rng.random() < 0.1:
        opts += " AUDIT CHANGES CCSID EBCDIC"
    comment = "-- comment with 'apostrophe sometimes\n" if rng.random() < 0.2 else ""
    fullname = f"{schema}.{name}" if schema else name
    decl = "DECLARE GLOBAL TEMPORARY TABLE" if (not mod and rng.random() < 0.08) \
        else f"CREATE {mod}TABLE"
    term = rng.choice([";", "@", ";"])
    return f"{comment}{decl} {fullname} (\n  {body}\n){opts}{term}\n"

def script(rng, idx):
    n = rng.randint(1, 5)
    parts = [table(rng, i) for i in range(n)]
    # sprinkle ALTER / DISTRIBUTE statements
    if rng.random() < 0.4:
        parts.append(f"ALTER TABLE T0_A ADD CONSTRAINT PKX PRIMARY KEY (C1);\n")
    if rng.random() < 0.3:
        parts.append("ALTER TABLE NO_SUCH_TABLE PARTITION BY RANGE (D);\n")
    if rng.random() < 0.3:
        parts.append("DISTRIBUTE BY HASH (C1);\n")
    return "\n".join(parts)

SF_TYPES = ["NUMBER(38,0)", "NUMBER(10,2)", "VARCHAR(100)", "VARCHAR",
            "VARIANT", "OBJECT", "ARRAY", "GEOGRAPHY", "GEOMETRY", "FLOAT",
            "BOOLEAN", "DATE", "TIME", "TIME(3)", "TIMESTAMP", "TIMESTAMP(9)",
            "TIMESTAMP_NTZ", "TIMESTAMP_NTZ(6)", "TIMESTAMP_LTZ(2)",
            "TIMESTAMP_TZ", "DATETIME", "BINARY(16)"]

def sf_column(rng):
    parts = [ident(rng), rng.choice(SF_TYPES)]
    if rng.random() < 0.3:
        parts.append("NOT NULL")
    if rng.random() < 0.15:
        parts.append(rng.choice(["AUTOINCREMENT", "IDENTITY(5,1)", "IDENTITY"]))
    if rng.random() < 0.2:
        parts.append("DEFAULT " + rng.choice(["0", "CURRENT_TIMESTAMP()", "'x'"]))
    if rng.random() < 0.1:
        parts.append("COMMENT 'a col comment'")
    if rng.random() < 0.08:
        parts.append("COLLATE 'en-ci'")
    if rng.random() < 0.08:
        parts.append("WITH MASKING POLICY mp1")
    return " ".join(parts)

def sf_table(rng, idx):
    mod = rng.choice(["", "", "", "TRANSIENT ", "TEMPORARY ", "DYNAMIC ",
                      "EXTERNAL ", "HYBRID "])
    orr = "OR REPLACE " if rng.random() < 0.5 else ""
    ine = "IF NOT EXISTS " if rng.random() < 0.2 else ""
    name = ".".join(filter(None, [
        rng.choice(["DB1", None]) if rng.random() < 0.3 else None,
        rng.choice(["ANALYTICS", "stg", None]),
        f"SF{idx}_" + rng.choice(["A", "Fact", "dim"])]))
    cols = [sf_column(rng) for _ in range(rng.randint(1, 7))]
    cons = []
    if rng.random() < 0.4:
        cons.append(f"PRIMARY KEY ({ident(rng)})")
    if rng.random() < 0.2:
        cons.append(f"CONSTRAINT FK{idx} FOREIGN KEY (C1) REFERENCES OTHER.T (C2)")
    if rng.random() < 0.2:
        cons.append(f"UNIQUE ({ident(rng)}, {ident(rng)})")
    body = ",\n  ".join(cols + cons)
    opts = ""
    if rng.random() < 0.3:
        opts += f"\nCLUSTER BY ({ident(rng)}, {ident(rng)})"
    if rng.random() < 0.2:
        opts += "\nDATA_RETENTION_TIME_IN_DAYS = " + str(rng.randint(0, 90))
    if rng.random() < 0.2:
        opts += "\nCHANGE_TRACKING = " + rng.choice(["TRUE", "FALSE"])
    if rng.random() < 0.2:
        opts += "\nCOMMENT = 'a table comment'"
    return f"CREATE {orr}{mod}TABLE {ine}{name} (\n  {body}\n){opts};\n"

def sf_script(rng, idx):
    return "\n".join(sf_table(rng, i) for i in range(rng.randint(1, 4)))

def gen_sf(outdir, n, seed):
    from db2ice.snowflake_converter import SnowflakeToIcebergConverter
    os.makedirs(outdir, exist_ok=True)
    rng = random.Random(seed)
    for i in range(n):
        s = sf_script(rng, i)
        base = os.path.join(outdir, f"fuzz_{i:03d}")
        open(base + ".sql", "w").write(s)
        conv = SnowflakeToIcebergConverter().convert(s)
        open(base + ".ref.iceberg.sql", "w").write(conv.iceberg_ddl)
        open(base + ".ref.meta.txt", "w").write(
            f"ewi={conv.ewi_count} tables={conv.tables_converted} success={conv.success}")
    print(f"generated {n} snowflake scripts in {outdir}")

def gen(outdir, n, seed):
    from db2ice.converter import DB2IceConverter
    from db2ice.assessor import Assessor
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import gen_report_golden as grg
    pdf_ns = grg.load_reference_pdf_code()
    os.makedirs(outdir, exist_ok=True)
    rng = random.Random(seed)
    for i in range(n):
        s = script(rng, i)
        base = os.path.join(outdir, f"fuzz_{i:03d}")
        open(base + ".sql", "w").write(s)
        conv = DB2IceConverter().convert(s)
        open(base + ".ref.iceberg.sql", "w").write(conv.iceberg_ddl)
        open(base + ".ref.meta.txt", "w").write(
            f"ewi={conv.ewi_count} tables={conv.tables_converted} success={conv.success}")
        report = Assessor().assess(s)
        open(base + ".ref.report.json", "w").write(report.to_json())
        # report sinks: the reference's own PDF generators, text-captured
        _, alines = grg.run_capture(pdf_ns["generate_assessment_pdf"], report)
        open(base + ".ref.report.txt", "w").write("\n".join(alines) + "\n")
        _, clines = grg.run_capture(pdf_ns["generate_conversion_pdf"], conv, report)
        open(base + ".ref.conversion.txt", "w").write("\n".join(clines) + "\n")
    print(f"generated {n} scripts in {outdir}")

def canon_json(s):
    def norm(v):
        if isinstance(v, dict):
            return {k: norm(x) for k, x in sorted(v.items())}
        if isinstance(v, list):
            return [norm(x) for x in v]
        if isinstance(v, (int, float)):
            return float(v)
        return v
    return norm(json.loads(s))

def cmp(outdir):
    bad = ok = 0
    import re
    for sql in sorted(glob.glob(os.path.join(outdir, "fuzz_*.sql"))):
        if not re.fullmatch(r"fuzz_\d+\.sql", os.path.basename(sql)):
            continue
        base = sql[:-len(".sql")]
        name = os.path.basename(base)
        problems = []
        for suffix in (".iceberg.sql", ".meta.txt"):
            ref = open(base + ".ref" + suffix).read()
            try:
                got = open(base + suffix).read()
            except FileNotFoundError:
                problems.append(f"missing graft output {suffix}")
                continue
            if suffix == ".meta.txt":  # Python True/False vs Scala true/false
                ref = ref.replace("True", "true").replace("False", "false")
            if ref != got:
                problems.append(f"mismatch {suffix}")
        if os.path.exists(base + ".ref.report.json"):
            try:
                r = canon_json(open(base + ".ref.report.json").read())
                g = canon_json(open(base + ".report.json").read())
                if r != g:
                    problems.append("mismatch report.json")
            except FileNotFoundError:
                problems.append("missing report.json")
        for suffix in (".report.txt", ".conversion.txt"):
            if os.path.exists(base + ".ref" + suffix):
                try:
                    if open(base + ".ref" + suffix).read() != open(base + suffix).read():
                        problems.append(f"mismatch {suffix}")
                except FileNotFoundError:
                    problems.append(f"missing {suffix}")
        if problems:
            bad += 1
            print(f"✗ {name}: {', '.join(problems)}")
        else:
            ok += 1
    print(f"== {ok} ok, {bad} bad ==")
    sys.exit(1 if bad else 0)

if __name__ == "__main__":
    if sys.argv[1] == "gen":
        gen(sys.argv[2], int(sys.argv[3]), int(sys.argv[4]))
    elif sys.argv[1] == "gensf":
        gen_sf(sys.argv[2], int(sys.argv[3]), int(sys.argv[4]))
    else:
        cmp(sys.argv[2])

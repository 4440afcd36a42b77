"""TestCSVIndexWriter matrix port (src/plugin/indexer-csv/src/test/...
/TestCSVIndexWriter.java:120-264): quoting, escaping, clipping,
multi-value joining, charsets, custom separators — against the
byte-exact CSVIndexWriter encoder, plus the distributed sink."""

import glob
import os

import pandas as pd

from coherencebot_ray.stages.tools import CSVIndexWriter, write_index


def one(params: dict, doc: dict) -> str:
    w = CSVIndexWriter(with_header=False, **params)
    return w.record_bytes(doc).decode(w.charset)


def test_csv_default():
    doc = {
        "id": "http://nutch.apache.org/",
        "title": "Welcome to Apache Nutch",
        "content": "Apache Nutch is an open source web-search software project. ...",
    }
    csv = one({}, doc)
    for v in doc.values():
        assert v in csv


def test_csv_quote_field_separators():
    csv = one({"fields": ("test", "test2")}, {"test": "a,b", "test2": "c,d"})
    assert csv.strip() == '"a,b","c,d"'


def test_csv_quote_record_separators():
    csv = one({"fields": ("test",)}, {"test": "a\nb"})
    assert csv.strip() == '"a\nb"'


def test_csv_escape_quotes():
    csv = one({"fields": ("test",)}, {"test": 'a,b:"quote",c'})
    assert csv.strip() == '"a,b:""quote"",c"'


def test_csv_escape_leading_quotes():
    csv = one({"fields": ("test",)}, {"test": '"quote"'})
    assert csv.strip() == '"""quote"""'


def test_csv_clip_max_length():
    csv = one({"fields": ("test",), "max_field_length": 8}, {"test": "0123456789"})
    assert csv.strip() == "01234567"


def test_csv_clip_max_length_quote():
    # escapes don't count toward the clip; scan stops at the clip point
    csv = one({"fields": ("test",), "max_field_length": 7},
              {"test": '1,"2",3,"4"'})
    assert csv.strip() == '"1,""2"",3"'


def test_csv_multi_value_fields():
    csv = one({"fields": ("test",), "value_separator": "|",
               "quote_character": ""}, {"test": ["abc", "def"]})
    assert csv.strip() == "abc|def"


def test_csv_encoding():
    for charset, text in (
        ("iso-8859-1", "äöüßéôî"),
        ("iso-8859-2", "ščřů"),
        ("iso-8859-5", "асдф"),
    ):
        w = CSVIndexWriter(fields=("test",), with_header=False, charset=charset)
        assert w.record_bytes({"test": text}).decode(charset).strip() == text


def test_csv_encoding_separator():
    w = CSVIndexWriter(fields=("test",), with_header=False,
                       charset="iso-8859-1", value_separator="¦",
                       quote_character="")
    raw = w.record_bytes({"test": ["abc", "def"]})
    assert raw.rstrip(b"\r\n") == b"abc\xa6def"


def test_csv_tab_separated():
    w = CSVIndexWriter(fields=("1", "2", "3"), with_header=False,
                       field_separator="\t", quote_character="")
    docs = [{"1": ["a", "b"], "2": 'a"2"b', "3": "c,d"},
            {"1": "A", "2": "B", "3": "C"}]
    records = "".join(w.record_bytes(d).decode("utf-8") for d in docs)
    rows = records.strip().split("\r\n")
    assert rows[0] == 'a|b\ta"2"b\tc,d'
    assert rows[1] == "A\tB\tC"


def test_csv_date_field():
    import datetime

    csv = one({"fields": ("date",)},
              {"date": datetime.datetime(1970, 1, 1, tzinfo=datetime.timezone.utc)})
    assert "1970" in csv


def test_csv_quote_param_truncated_to_char():
    # Separator.setFromConf(isChar): only the first char is used
    w = CSVIndexWriter(fields=("t",), quote_character="ab")
    assert w.quote == "a" and w.escape == "a"


def test_csv_header_and_sink(tmp_path, ray_session):
    import ray.data as rd

    docs = rd.from_pandas(pd.DataFrame(
        {"id": ["u1", "u2"], "title": ["a,b", "t2"], "content": ["x", "y"]}))
    out = str(tmp_path / "csv")
    write_index(docs, out, fmt="nutch_csv")
    files = sorted(glob.glob(os.path.join(out, "nutch-*.csv")))
    assert files
    text = "".join(open(f, "rb").read().decode("utf-8") for f in files)
    assert text.startswith("id,title,content\r\n")
    assert '"a,b"' in text and "u2,t2,y" in text

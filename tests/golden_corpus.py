"""Golden corpus: every test message from the reference, ported verbatim.

Sources (FIXTURES.md §3): /root/reference/src/parser.rs:409-650,
src/message.rs:174-252, examples/bench.rs:12-42. Each entry is
(name, input_line, expected) where expected is either a dict of the fields
the reference test asserts, or the string "ERROR" / "ERROR:<variant>".
"""

# fields not asserted by the reference test are omitted from expected dicts;
# the harness only checks the listed keys.
GOLDEN = [
    # parser.rs:420-431
    ("simple", "<1>1 - - - - - -", {
        "facility": 0, "severity": 1, "timestamp": None,
        "timestamp_nanos": None, "hostname": None, "appname": None,
        "procid_pid": None, "procid_name": None, "msgid": None,
        "sd": {}, "msg": "", "version": 1, "parse_error": None,
    }),
    # parser.rs:433-438
    ("time_zulu", "<1>1 2015-01-01T00:00:00Z host - - - -", {
        "timestamp": 1420070400, "timestamp_nanos": 0, "hostname": "host",
    }),
    # parser.rs:440-445
    ("time_offset", "<1>1 2015-01-01T00:00:00+00:00 - - - - -", {
        "timestamp": 1420070400,
    }),
    # parser.rs:447-464
    ("time_offset_nonzero", "<1>1 2015-01-01T00:00:00-10:00 - - - - -", {
        "timestamp": 1420106400,
    }),
    ("time_offset_rfc3339_a", "<1>1 2015-01-01T18:50:00-04:00 - - - - -", {
        "timestamp": 1420152600,  # == 2015-01-01T22:50:00Z
    }),
    ("time_offset_rfc3339_b", "<1>1 2015-01-01T22:50:00Z - - - - -", {
        "timestamp": 1420152600,
    }),
    ("time_offset_4545_a", "<1>1 2019-01-20T00:46:39+05:45 - - - - -", {
        "timestamp": 1547924499,
    }),
    ("time_offset_4545_b", "<1>1 2019-01-19T11:01:39-08:00 - - - - -", {
        "timestamp": 1547924499,
    }),
    # parser.rs:466-482
    ("complex",
     '<78>1 2016-01-15T00:04:01+00:00 host1 CROND 10391 - '
     '[meta sequenceId="29"] some_message', {
        "facility": 9, "severity": 6, "hostname": "host1",
        "appname": "CROND", "procid_pid": 10391, "procid_name": None,
        "msg": "some_message", "timestamp": 1452816241,
        "sd": {"meta": {"sequenceId": "29"}},
    }),
    # parser.rs:484-505
    ("sd_empty",
     "<78>1 2016-01-15T00:04:01Z host1 CROND 10391 - [meta@1234] some_message", {
        "facility": 9, "severity": 6, "hostname": "host1",
        "appname": "CROND", "procid_pid": 10391, "msg": "some_message",
        "timestamp": 1452816241, "sd": {"meta@1234": {}},
    }),
    # parser.rs:507-522 — duplicate SD-ID merged, 3 params in meta
    ("sd_features",
     '<78>1 2016-01-15T00:04:01Z host1 CROND 10391 - '
     '[meta sequenceId="29" sequenceBlah="foo"][my key="value"]'
     '[meta bar="baz="] some_message', {
        "facility": 9, "severity": 6, "msg": "some_message",
        "sd": {
            "meta": {"bar": "baz=", "sequenceBlah": "foo", "sequenceId": "29"},
            "my": {"key": "value"},
        },
    }),
    # parser.rs:524-534
    ("sd_escaped_quote",
     '<1>1 - - - - - [meta key="val\\"ue"] message', {
        "sd": {"meta": {"key": 'val"ue'}}, "msg": "message",
    }),
    # parser.rs:536-540 (long word-salad MSG; just must parse)
    ("other_message",
     '<190>1 2016-02-21T01:19:11+00:00 batch6sj - - - '
     '[meta sequenceId="21881798" x-group="37051387"]'
     '[origin x-service="tracking"] metascutellar conversationalist '
     'nephralgic exogenetic graphy streng outtaken acouasm amateurism '
     'prenotice Lyonese bedull antigrammatical diosphenol gastriloquial '
     'bayoneteer sweetener naggy roughhouser dighter addend sulphacid '
     'uneffectless ferroprussiate reveal Mazdaist plaudite Australasian '
     'distributival wiseman rumness Seidel topazine shahdom sinsion '
     'mesmerically pinguedinous ophthalmotonometer scuppler wound eciliate '
     'expectedly carriwitchet dictatorialism bindweb pyelitic idic atule '
     'kokoon poultryproof rusticial seedlip nitrosate splenadenoma '
     'holobenthic uneternal Phocaean epigenic doubtlessly indirection '
     'torticollar robomb adoptedly outspeak wappenschawing talalgia Goop '
     'domitic savola unstrafed carded unmagnified mythologically orchester '
     'obliteration imperialine undisobeyed galvanoplastical cycloplegia '
     'quinquennia foremean umbonal marcgraviaceous happenstance theoretical '
     'necropoles wayworn Igbira pseudoangelic raising unfrounced lamasary '
     'centaurial Japanolatry microlepidoptera', {
        "facility": 23, "severity": 6, "parse_error": None,
    }),
    # parser.rs:542-546 — '<4096>': PRI caps at 3 digits, '>' expected at '6'
    ("bad_pri", "<4096>1 - - - - - -", "ERROR:ExpectedTokenErr:>"),
    # parser.rs:548-553 — RFC3164 is not parseable ('Feb' where version digits)
    ("bad_match", "<134>Feb 18 20:53:31 haproxy[376]: I am a message",
     "ERROR:TooFewDigits"),
    # parser.rs:555-591 — RFC 5424 §6.2.3 example timestamps
    ("rfc_ts_1", "<1>1 1985-04-12T23:20:50.52Z host - - - -", {
        "timestamp": 482196050, "timestamp_nanos": 520000000,
    }),
    ("rfc_ts_2", "<1>1 1985-04-12T19:20:50.52+04:00 host - - - -", {
        "timestamp": 482167250, "timestamp_nanos": 520000000,
    }),
    ("rfc_ts_3", "<1>1 1985-04-12T19:20:50+04:00 host - - - -", {
        "timestamp": 482167250, "timestamp_nanos": 0,
    }),
    ("rfc_ts_4", "<1>1 2003-08-24T05:14:15.000003+07:00 host - - - -", {
        "timestamp": 1061676855, "timestamp_nanos": 3000,
    }),
    ("rfc_ts_5", "<1>1 2003-08-24T05:14:15.000000003+07:00 host - - - -", {
        "timestamp": 1061676855, "timestamp_nanos": 3,
    }),
    ("rfc_ts_6", "<1>1 2003-08-24T05:14:15.123456789+07:00 host - - - -", {
        "timestamp": 1061676855, "timestamp_nanos": 123456789,
    }),
    # 10 fractional digits: frac caps at 9, then the offset matcher sees a
    # digit (parser.rs:296-298)
    ("rfc_ts_bad", "<1>1 2003-08-24T05:14:15.1122334455+07:00 host - - - -",
     "ERROR:InvalidUTCOffset"),
    # parser.rs:593-621 — Juniper message, empty param value, empty MSG
    ("empty_sd_value",
     '<29>1 2018-05-14T08:23:01.520Z leyal_test4 mgd 13894 UI_CHILD_EXITED '
     '[junos@2636.1.1.1.2.57 pid="14374" return-value="5" '
     'core-dump-status="" command="/usr/sbin/mustd"]', {
        "facility": 3, "severity": 5, "hostname": "leyal_test4",
        "appname": "mgd", "procid_pid": 13894, "msgid": "UI_CHILD_EXITED",
        "msg": "", "timestamp": 1526286181, "timestamp_nanos": 520000000,
        "sd": {"junos@2636.1.1.1.2.57": {
            "command": "/usr/sbin/mustd", "core-dump-status": "",
            "pid": "14374", "return-value": "5",
        }},
    }),
    # parser.rs:623-639 — dash-prefixed terms are NOT nil
    ("dash_prefix",
     '<39>1 2018-05-15T20:56:58+00:00 -web1west '
     '-201805020050-bc5d6a47c3-master - - [meta sequenceId="28485532"] '
     '25450-uWSGI worker 6: getaddrinfo*.gaih_getanswer: got type "DNAME"', {
        "hostname": "-web1west", "appname": "-201805020050-bc5d6a47c3-master",
        "sd": {"meta": {"sequenceId": "28485532"}},
        "msg": '25450-uWSGI worker 6: getaddrinfo*.gaih_getanswer: '
               'got type "DNAME"',
    }),
    # parser.rs:641-649
    ("truncated", "<39>1 2018-05-15T20:56:58+00:00 -web1west -",
     "ERROR:UnexpectedEndOfInput"),
    # examples/bench.rs:42 — HTTP-access-log-like MSG with quotes
    ("bench_average",
     '<29>1 2016-02-21T04:32:57+00:00 web1 someservice - - '
     '[origin x-service="someservice"][meta sequenceId="14125553"] '
     '127.0.0.1 - - 1456029177 "GET /v1/ok HTTP/1.1" 200 145 "-" '
     '"hacheck 0.9.0" 24306 127.0.0.1:40124 575', {
        "facility": 3, "severity": 5, "hostname": "web1",
        "appname": "someservice",
        "sd": {"meta": {"sequenceId": "14125553"},
               "origin": {"x-service": "someservice"}},
        "msg": '127.0.0.1 - - 1456029177 "GET /v1/ok HTTP/1.1" 200 145 '
               '"-" "hacheck 0.9.0" 24306 127.0.0.1:40124 575',
    }),
    # examples/bench.rs:18 — UTF-8 BOM preserved verbatim in MSG; +05:30 zone
    ("bench_bom",
     "<14>1 2017-07-26T14:47:35.869952+05:30 my_hostname custom_appname "
     "5678 some_unique_msgid - ﻿Some other message", {
        "facility": 1, "severity": 6, "hostname": "my_hostname",
        "appname": "custom_appname", "procid_pid": 5678,
        "msgid": "some_unique_msgid", "sd": {},
        "msg": "﻿Some other message",
        "timestamp": 1501060655, "timestamp_nanos": 869952000,
    }),
    # --- additional grammar-exactness cases derived from the reference ---
    # procid that is not an i32 becomes Name (parser.rs:357-360)
    ("procid_name", "<1>1 - - app worker-3 - - hi", {
        "appname": "app", "procid_pid": None, "procid_name": "worker-3",
        "msg": "hi",
    }),
    # procid above i32 range becomes Name
    ("procid_overflow", "<1>1 - - - 2147483648 - - hi", {
        "procid_pid": None, "procid_name": "2147483648",
    }),
    ("procid_i32_max", "<1>1 - - - 2147483647 - - hi", {
        "procid_pid": 2147483647, "procid_name": None,
    }),
    ("procid_signed", "<1>1 - - - -5 - - hi", {
        "procid_pid": -5, "procid_name": None,
    }),
    # empty MSG: line ends right after SD, no trailing space (parser.rs:365-368)
    ("empty_msg_after_sd", '<1>1 - - - - - [meta k="v"]', {
        "sd": {"meta": {"k": "v"}}, "msg": "",
    }),
    # one trailing space after nil SD => empty msg
    ("empty_msg_trailing_space", "<1>1 - - - - - - ", {
        "sd": {}, "msg": "",
    }),
    # msg is everything after ONE optional space (second space kept)
    ("msg_leading_space", "<1>1 - - - - - -  two spaces", {
        "msg": " two spaces",
    }),
    # escape drops backslash for ANY char (parser.rs:130-154)
    ("escape_any", '<1>1 - - - - - [m a="x\\ky" b="s\\\\t" c="br\\]kt"] m', {
        "sd": {"m": {"a": "xky", "b": "s\\t", "c": "br]kt"}},
    }),
    # param value may contain spaces and ']' when escaped or quoted
    ("param_spaces", '<1>1 - - - - - [m a="has space"] m', {
        "sd": {"m": {"a": "has space"}},
    }),
    # missing offset inside a message is an error (parser.rs:296-298)
    ("ts_no_offset", "<1>1 2015-01-01T00:00:00 host - - - -",
     "ERROR:InvalidUTCOffset"),
    # payloads carried like the reference: InvalidMonth(u8) records the bad
    # month, InvalidDate(String) the failing component name (parser.rs:40-42)
    ("bad_month", "<1>1 2015-13-01T00:00:00Z host - - - -",
     "ERROR:InvalidMonth:13"),
    ("bad_mday", "<1>1 2015-02-29T00:00:00Z host - - - -",
     "ERROR:InvalidDate:day"),
    ("leap_mday", "<1>1 2016-02-29T00:00:00Z host - - - -", {
        "timestamp": 1456704000,
    }),
    ("bad_hour", "<1>1 2015-01-01T24:00:00Z host - - - -",
     "ERROR:InvalidDate:hour"),
    ("bad_minute", "<1>1 2015-01-01T00:60:00Z host - - - -",
     "ERROR:InvalidDate:minute"),
    ("bad_second", "<1>1 2015-01-01T00:00:60Z host - - - -",
     "ERROR:InvalidDate:second"),
    ("bad_month_zero", "<1>1 2015-00-01T00:00:00Z host - - - -",
     "ERROR:InvalidMonth:0"),
    # offset minutes out of UtcOffset::from_hms range (parser.rs:303-306)
    ("bad_offset_minutes", "<1>1 2015-01-01T18:50:00-04:90 - - - - -",
     "ERROR:InvalidOffset"),
    ("bad_offset_hours", "<1>1 2015-01-01T18:50:00+26:00 - - - - -",
     "ERROR:InvalidOffset"),
    # PRI 200 => facility 25 > 23 (parser.rs:206-210)
    ("bad_facility", "<200>1 - - - - - -", "ERROR:BadFacilityInPri"),
    # 2-digit version is legal (parser.rs:349)
    ("version_2digit", "<1>10 - - - - - -", {"version": 10}),
    # SD not nil and not '[' => ExpectedTokenErr('[')
    ("bad_sd_start", "<1>1 - - - - - x", "ERROR:ExpectedTokenErr:["),
    # nil SD '-' immediately followed by text: '-' consumed, msg = rest
    ("nil_sd_glued", "<1>1 - - - - - -msg", {"sd": {}, "msg": "msg"}),
    # unterminated SD
    ("sd_unterminated", '<1>1 - - - - - [meta k="v"',
     "ERROR:UnexpectedEndOfInput"),
    ("sd_param_no_eq", '<1>1 - - - - - [meta k] m', "ERROR:ExpectedTokenErr:="),
    # empty SD-ID is legal: '[]'
    ("sd_empty_id", "<1>1 - - - - - [] m", {"sd": {"": {}}, "msg": "m"}),
    ("truncated_after_msgid", "<1>1 - - - - -", "ERROR:UnexpectedEndOfInput"),
    # MSG takes the raw remainder — embedded newlines/tabs preserved
    ("msg_with_newline", "<1>1 - - - - - - line1\nline2\ttab", {
        "msg": "line1\nline2\ttab",
    }),
    # term at exactly max length is fine; one over breaks the next take_char
    ("hostname_255", "<1>1 - " + "h" * 255 + " - - - - m", {
        "hostname": "h" * 255,
    }),
    ("hostname_256", "<1>1 - " + "h" * 256 + " - - - - m",
     "ERROR:ExpectedTokenErr: "),
    # PRI boundary: 191 = facility 23 (max valid); 192 = facility 24 (error)
    ("pri_max_valid", "<191>1 - - - - - -", {"facility": 23, "severity": 7}),
    ("pri_min_invalid_fac", "<192>1 - - - - - -", "ERROR:BadFacilityInPri"),
    # a term containing a non-ASCII char ends at the first non-printable
    # byte; the following take_char(' ') then fails
    ("hostname_nonascii", "<1>1 - hôst - - - - m", "ERROR:ExpectedTokenErr: "),
    # remaining length caps: appname 48, procid 128, msgid 32 (parser.rs:355-362)
    ("appname_48", "<1>1 - - " + "a" * 48 + " - - - m", {"appname": "a" * 48}),
    ("appname_49", "<1>1 - - " + "a" * 49 + " - - - m",
     "ERROR:ExpectedTokenErr: "),
    ("procid_128", "<1>1 - - - " + "p" * 128 + " - - m",
     {"procid_name": "p" * 128}),
    ("procid_129", "<1>1 - - - " + "p" * 129 + " - - m",
     "ERROR:ExpectedTokenErr: "),
    ("msgid_32", "<1>1 - - - - " + "i" * 32 + " - m", {"msgid": "i" * 32}),
    ("msgid_33", "<1>1 - - - - " + "i" * 33 + " - m",
     "ERROR:ExpectedTokenErr: "),
    # SD-ID cap is 128 (parser.rs:108-117); one over fails at take_char(']')
    ("sd_id_128", "<1>1 - - - - - [" + "s" * 128 + "] m",
     {"sd": {"s" * 128: {}}, "msg": "m"}),
    ("sd_id_129", "<1>1 - - - - - [" + "s" * 129 + "] m",
     "ERROR:ExpectedTokenErr:]"),
    ("truncated_mid_pri", "<1", "ERROR:UnexpectedEndOfInput"),
    ("empty_line", "", "ERROR:UnexpectedEndOfInput"),
    ("not_syslog", "hello world", "ERROR:ExpectedTokenErr:<"),
]

"""Extended grok pattern library: haproxy / linux-syslog / java + smaller
application sets (ruby, redis, mongodb, postgresql, mcollective, shorewall).

These pattern NAMES and capture vocabularies are the public logstash grok
vocabulary — the reference vendors the same sets as text files under
/root/reference/lib/patterns/grok/ (haproxy, linux-syslog, java, ...) and its
grok test exercises ``%{HAPROXYHTTP}`` (test_218_filter_grok.js:38-84).  The
bodies here are written against the documented log formats themselves
(haproxy 1.4 httplog/tcplog format docs, RFC 3164/5424 syslog, JVM stack
trace syntax, Ruby Logger, redis/mongodb server logs); where a format is
rigid (e.g. the haproxy httplog field order) the regex necessarily matches
the canonical public pattern text.

Layered over CORE_PATTERNS by GrokCompiler (grok.py) — same shadowing the
reference gets from its pattern directories (patterns_loader.js:14-46).
"""

from __future__ import annotations

# --- haproxy (httplog / tcplog formats, haproxy 1.4 docs) --------------------

HAPROXY_PATTERNS: dict[str, str] = {
    "HAPROXYTIME": r"%{HOUR:haproxy_hour}:%{MINUTE:haproxy_minute}(?::%{SECOND:haproxy_second})",
    "HAPROXYDATE": r"%{MONTHDAY:haproxy_monthday}/%{MONTH:haproxy_month}/%{YEAR:haproxy_year}:%{HAPROXYTIME:haproxy_time}\.%{INT:haproxy_milliseconds}",
    # override these to parse the headers captured by your haproxy.cfg
    "HAPROXYCAPTUREDREQUESTHEADERS": r"%{DATA:captured_request_headers}",
    "HAPROXYCAPTUREDRESPONSEHEADERS": r"%{DATA:captured_response_headers}",
    "HAPROXYHTTP": (
        r"%{SYSLOGTIMESTAMP:syslog_timestamp} %{IPORHOST:syslog_server} "
        r"%{SYSLOGPROG}: %{IP:client_ip}:%{INT:client_port} "
        r"\[%{HAPROXYDATE:accept_date}\] %{NOTSPACE:frontend_name} "
        r"%{NOTSPACE:backend_name}/%{NOTSPACE:server_name} "
        r"%{INT:time_request}/%{INT:time_queue}/%{INT:time_backend_connect}"
        r"/%{INT:time_backend_response}/%{NOTSPACE:time_duration} "
        r"%{INT:http_status_code} %{NOTSPACE:bytes_read} "
        r"%{DATA:captured_request_cookie} %{DATA:captured_response_cookie} "
        r"%{NOTSPACE:termination_state} "
        r"%{INT:actconn}/%{INT:feconn}/%{INT:beconn}/%{INT:srvconn}"
        r"/%{NOTSPACE:retries} %{INT:srv_queue}/%{INT:backend_queue} "
        r"(\{%{HAPROXYCAPTUREDREQUESTHEADERS}\})?( )?"
        r"(\{%{HAPROXYCAPTUREDRESPONSEHEADERS}\})?( )?"
        r"\"(<BADREQ>|(%{WORD:http_verb} (%{URIPROTO:http_proto}://)?"
        r"(?:%{USER:http_user}(?::[^@]*)?@)?(?:%{URIHOST:http_host})?"
        r"(?:%{URIPATHPARAM:http_request})?( HTTP/%{NUMBER:http_version})?))?\""
    ),
    "HAPROXYTCP": (
        r"%{SYSLOGTIMESTAMP:syslog_timestamp} %{IPORHOST:syslog_server} "
        r"%{SYSLOGPROG}: %{IP:client_ip}:%{INT:client_port} "
        r"\[%{HAPROXYDATE:accept_date}\] %{NOTSPACE:frontend_name} "
        r"%{NOTSPACE:backend_name}/%{NOTSPACE:server_name} "
        r"%{INT:time_queue}/%{INT:time_backend_connect}/%{NOTSPACE:time_duration} "
        r"%{NOTSPACE:bytes_read} %{NOTSPACE:termination_state} "
        r"%{INT:actconn}/%{INT:feconn}/%{INT:beconn}/%{INT:srvconn}"
        r"/%{NOTSPACE:retries} %{INT:srv_queue}/%{INT:backend_queue}"
    ),
}

# --- linux-syslog (RFC 3164 lines, RFC 5424 structured, pam, cron) -----------

LINUX_SYSLOG_PATTERNS: dict[str, str] = {
    "SYSLOG5424PRINTASCII": r"[!-~]+",
    "SYSLOGBASE2": (
        r"(?:%{SYSLOGTIMESTAMP:timestamp}|%{TIMESTAMP_ISO8601:timestamp8601}) "
        r"(?:%{SYSLOGFACILITY} )?%{SYSLOGHOST:logsource} %{SYSLOGPROG}:"
    ),
    "SYSLOGPAMSESSION": (
        r"%{SYSLOGBASE} %{WORD:pam_module}\(%{DATA:pam_caller}\): "
        r"session %{WORD:pam_session_state} for user %{USERNAME:username}"
        r"(?: by %{GREEDYDATA:pam_by})?"
    ),
    "CRON_ACTION": r"[A-Z ]+",
    "CRONLOG": r"%{SYSLOGBASE} \(%{USER:user}\) %{CRON_ACTION:action} \(%{DATA:cron_message}\)",
    "SYSLOGLINE": r"%{SYSLOGBASE2} %{GREEDYDATA:syslog_message}",
    # RFC 5424
    "SYSLOG5424PRI": r"<%{NONNEGINT:syslog5424_pri}>",
    "SYSLOG5424SD": r"\[%{DATA}\]+",
    "SYSLOG5424LINE": (
        r"%{SYSLOG5424PRI}%{NONNEGINT:syslog5424_ver} +"
        r"(?:%{TIMESTAMP_ISO8601:syslog5424_ts}|-) +"
        r"(?:%{HOSTNAME:syslog5424_host}|-) +"
        r"(?:%{SYSLOG5424PRINTASCII:syslog5424_app}|-) +"
        r"(?:%{SYSLOG5424PRINTASCII:syslog5424_proc}|-) +"
        r"(?:%{SYSLOG5424PRINTASCII:syslog5424_msgid}|-) +"
        r"(?:%{SYSLOG5424SD:syslog5424_sd}|-|) +%{GREEDYDATA:syslog5424_msg}"
    ),
}

# --- java (JVM stack traces, catalina/tomcat timestamps) ---------------------

JAVA_PATTERNS: dict[str, str] = {
    "JAVACLASS": r"(?:[a-zA-Z$_][a-zA-Z$_0-9]*\.)*[a-zA-Z$_][a-zA-Z$_0-9]*",
    # space allowed: 'Native Method' / 'Unknown Source'
    "JAVAFILE": r"(?:[A-Za-z0-9_. -]+)",
    # special <init> constructor frame
    "JAVAMETHOD": r"(?:<init>|[a-zA-Z$_][a-zA-Z$_0-9]*)",
    # line number optional: 'Native Method' / 'Unknown Source' frames
    "JAVASTACKTRACEPART": (
        r"%{SPACE}at %{JAVACLASS:class}\.%{JAVAMETHOD:method}"
        r"\(%{JAVAFILE:file}(?::%{NUMBER:line})?\)"
    ),
    "JAVATHREAD": r"(?:[A-Z]{2}-Processor[\d]+)",
    "JAVALOGMESSAGE": r"(?:.*)",
    # 'Jan 9, 2014 7:13:13 AM' (catalina)
    "CATALINA_DATESTAMP": (
        r"%{MONTH} %{MONTHDAY}, %{YEAR} %{HOUR}:?%{MINUTE}(?::?%{SECOND}) (?:AM|PM)"
    ),
    "CATALINALOG": (
        r"%{CATALINA_DATESTAMP:timestamp} %{JAVACLASS:class} "
        r"%{JAVALOGMESSAGE:logmessage}"
    ),
    # '2014-01-09 17:32:25,527 -0800' (tomcat)
    "TOMCAT_DATESTAMP": (
        r"%{YEAR}-%{MONTHNUM}-%{MONTHDAY} %{HOUR}:?%{MINUTE}(?::?%{SECOND}) "
        r"%{ISO8601_TIMEZONE}"
    ),
    "TOMCATLOG": (
        r"%{TOMCAT_DATESTAMP:timestamp} \| %{LOGLEVEL:level} \| "
        r"%{JAVACLASS:class} - %{JAVALOGMESSAGE:logmessage}"
    ),
}

# --- small application sets ---------------------------------------------------

APP_PATTERNS: dict[str, str] = {
    # ruby Logger default format: 'W, [ts #pid]  WARN -- progname: msg'
    "RUBY_LOGLEVEL": r"(?:DEBUG|FATAL|ERROR|WARN|INFO)",
    "RUBY_LOGGER": (
        r"[DFEWI], \[%{TIMESTAMP_ISO8601:timestamp} #%{POSINT:pid}\] "
        r"*%{RUBY_LOGLEVEL:loglevel} -- +%{DATA:progname}: %{GREEDYDATA:log_message}"
    ),
    # redis-server log prefix: '[4018] 14 Nov 07:01:22.119 * ...'
    "REDISTIMESTAMP": r"%{MONTHDAY} %{MONTH} %{TIME}",
    "REDISLOG": r"\[%{POSINT:pid}\] %{REDISTIMESTAMP:timestamp} \*",
    # mongodb server log: 'Tue Nov 19 09:08:52 [conn123] message'
    "MONGO_LOG": r"%{SYSLOGTIMESTAMP:timestamp} \[%{WORD:component}\] %{GREEDYDATA:mongo_message}",
    "MONGO_WORDDASH": r"\b[\w-]+\b",
    # postgresql log_line_prefix '%t %u %d %p'
    "POSTGRESQL": (
        r"%{DATESTAMP:timestamp} %{TZ} %{DATA:user_id} "
        r"%{GREEDYDATA:connection_id} %{POSINT:pid}"
    ),
    # mcollective audit / agent logs
    "MCOLLECTIVEAUDIT": r"%{TIMESTAMP_ISO8601:timestamp}:",
    "MCOLLECTIVE": r"., \[%{TIMESTAMP_ISO8601:timestamp} #%{POSINT:pid}\]%{SPACE}%{LOGLEVEL:event_level}",
    # shorewall (netfilter) log line
    "SHOREWALL": (
        r"(%{SYSLOGTIMESTAMP:timestamp}) (%{WORD:nf_host}) kernel:.*"
        r"Shorewall:(%{WORD:nf_action1})?:(%{WORD:nf_action2})?.*"
        r"IN=(%{USERNAME:nf_in_interface})?.*OUT=(%{USERNAME:nf_out_interface})?.*"
        r"SRC=(%{IPV4:nf_src_ip}).*DST=(%{IPV4:nf_dst_ip}).*LEN=(%{WORD:nf_len})?"
        r".*PROTO=(%{WORD:nf_protocol})?.*SPT=(%{INT:nf_src_port})?"
        r".*DPT=(%{INT:nf_dst_port})?"
    ),
}

EXTENDED_PATTERNS: dict[str, str] = {
    **HAPROXY_PATTERNS,
    **LINUX_SYSLOG_PATTERNS,
    **JAVA_PATTERNS,
    **APP_PATTERNS,
}

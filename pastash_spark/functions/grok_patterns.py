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

# --- firewalls (cisco ASA syslog message formats, netscreen, junos, mikrotik)
# The ASA message grammars are Cisco's documented %ASA-<sev>-<id> formats;
# the grok encodings below are the community-standard ones for them.

FIREWALL_PATTERNS: dict[str, str] = {
    # MAC address forms
    "CISCOMAC": r"(?:[A-Fa-f0-9]{4}\.){2}[A-Fa-f0-9]{4}",
    "WINDOWSMAC": r"(?:[A-Fa-f0-9]{2}-){5}[A-Fa-f0-9]{2}",
    "COMMONMAC": r"(?:[A-Fa-f0-9]{2}:){5}[A-Fa-f0-9]{2}",
    "MAC": r"%{CISCOMAC}|%{WINDOWSMAC}|%{COMMONMAC}",
    # NetScreen session log
    "NETSCREENSESSIONLOG": (
        r"%{SYSLOGTIMESTAMP:date} %{IPORHOST:device} %{IPORHOST}: "
        r"NetScreen device_id=%{WORD:device_id}%{DATA}: "
        r"start_time=%{QUOTEDSTRING:start_time} duration=%{INT:duration} "
        r"policy_id=%{INT:policy_id} service=%{DATA:service} "
        r"proto=%{INT:proto} src zone=%{WORD:src_zone} "
        r"dst zone=%{WORD:dst_zone} action=%{WORD:action} "
        r"sent=%{INT:sent} rcvd=%{INT:rcvd} src=%{IPORHOST:src_ip} "
        r"dst=%{IPORHOST:dst_ip} src_port=%{INT:src_port} "
        r"dst_port=%{INT:dst_port} src-xlated ip=%{IPORHOST:src_xlated_ip} "
        r"port=%{INT:src_xlated_port} dst-xlated ip=%{IPORHOST:dst_xlated_ip} "
        r"port=%{INT:dst_xlated_port} session_id=%{INT:session_id} "
        r"reason=%{GREEDYDATA:reason}"
    ),
    # cisco ASA particles
    "CISCO_TAGGED_SYSLOG": (
        r"^<%{POSINT:syslog_pri}>%{CISCOTIMESTAMP:timestamp}"
        r"( %{SYSLOGHOST:sysloghost})?: %%{CISCOTAG:ciscotag}:"
    ),
    "CISCOTIMESTAMP": r"%{MONTH} +%{MONTHDAY}(?: %{YEAR})? %{TIME}",
    "CISCOTAG": r"[A-Z0-9]+-%{INT}-(?:[A-Z0-9_]+)",
    "CISCO_ACTION": (r"Built|Teardown|Deny|Denied|denied|requested|permitted"
                     r"|denied by ACL|discarded|est-allowed|Dropping|created"
                     r"|deleted"),
    "CISCO_REASON": (r"Duplicate TCP SYN|Failed to locate egress interface"
                     r"|Invalid transport field|No matching connection"
                     r"|DNS Response|DNS Query|(?:%{WORD}\s*)*"),
    "CISCO_DIRECTION": r"Inbound|inbound|Outbound|outbound",
    "CISCO_INTERVAL": r"first hit|%{INT}-second interval",
    "CISCO_XLATE_TYPE": r"static|dynamic",
    # common ASA message bodies
    "CISCOFW106001": (
        r"%{CISCO_DIRECTION:direction} %{WORD:protocol} connection "
        r"%{CISCO_ACTION:action} from %{IP:src_ip}/%{INT:src_port} to "
        r"%{IP:dst_ip}/%{INT:dst_port} flags %{GREEDYDATA:tcp_flags} "
        r"on interface %{GREEDYDATA:interface}"
    ),
    "CISCOFW106006_106007_106010": (
        r"%{CISCO_ACTION:action} %{CISCO_DIRECTION:direction} "
        r"%{WORD:protocol} (?:from|src) %{IP:src_ip}/%{INT:src_port}"
        r"(\(%{DATA:src_fwuser}\))? (?:to|dst) %{IP:dst_ip}/%{INT:dst_port}"
        r"(\(%{DATA:dst_fwuser}\))? (?:on interface %{DATA:interface}"
        r"|due to %{CISCO_REASON:reason})"
    ),
    "CISCOFW106014": (
        r"%{CISCO_ACTION:action} %{CISCO_DIRECTION:direction} "
        r"%{WORD:protocol} src %{DATA:src_interface}:%{IP:src_ip}"
        r"(\(%{DATA:src_fwuser}\))? dst %{DATA:dst_interface}:%{IP:dst_ip}"
        r"(\(%{DATA:dst_fwuser}\))? \(type %{INT:icmp_type}, "
        r"code %{INT:icmp_code}\)"
    ),
    "CISCOFW106015": (
        r"%{CISCO_ACTION:action} %{WORD:protocol} \(%{DATA:policy_id}\) "
        r"from %{IP:src_ip}/%{INT:src_port} to %{IP:dst_ip}/%{INT:dst_port} "
        r"flags %{DATA:tcp_flags}  on interface %{GREEDYDATA:interface}"
    ),
    "CISCOFW106021": (
        r"%{CISCO_ACTION:action} %{WORD:protocol} reverse path check from "
        r"%{IP:src_ip} to %{IP:dst_ip} on interface %{GREEDYDATA:interface}"
    ),
    "CISCOFW106023": (
        r"%{CISCO_ACTION:action} %{WORD:protocol} src "
        r"%{DATA:src_interface}:%{IP:src_ip}(/%{INT:src_port})?"
        r"(\(%{DATA:src_fwuser}\))? dst %{DATA:dst_interface}:%{IP:dst_ip}"
        r"(/%{INT:dst_port})?(\(%{DATA:dst_fwuser}\))?"
        r"( \(type %{INT:icmp_type}, code %{INT:icmp_code}\))? "
        r"by access-group %{DATA:policy_id} "
        r"\[%{DATA:hashcode1}, %{DATA:hashcode2}\]"
    ),
    "CISCOFW106100": (
        r"access-list %{WORD:policy_id} %{CISCO_ACTION:action} "
        r"%{WORD:protocol} %{DATA:src_interface}/%{IP:src_ip}"
        r"\(%{INT:src_port}\)(\(%{DATA:src_fwuser}\))? -> "
        r"%{DATA:dst_interface}/%{IP:dst_ip}\(%{INT:dst_port}\)"
        r"(\(%{DATA:dst_fwuser}\))? hit-cnt %{INT:hit_count} "
        r"%{CISCO_INTERVAL:interval} \[%{DATA:hashcode1}, %{DATA:hashcode2}\]"
    ),
    "CISCOFW302010": (
        r"%{INT:connection_count} in use, %{INT:connection_count_max} "
        r"most used"
    ),
    "CISCOFW302013_302014_302015_302016": (
        r"%{CISCO_ACTION:action}(?: %{CISCO_DIRECTION:direction})? "
        r"%{WORD:protocol} connection %{INT:connection_id} for "
        r"%{DATA:src_interface}:%{IP:src_ip}/%{INT:src_port}"
        r"( \(%{IP:src_mapped_ip}/%{INT:src_mapped_port}\))?"
        r"(\(%{DATA:src_fwuser}\))? to "
        r"%{DATA:dst_interface}:%{IP:dst_ip}/%{INT:dst_port}"
        r"( \(%{IP:dst_mapped_ip}/%{INT:dst_mapped_port}\))?"
        r"(\(%{DATA:dst_fwuser}\))?"
        r"( duration %{TIME:duration} bytes %{INT:bytes})?"
        r"(?: %{CISCO_REASON:reason})?( \(%{DATA:user}\))?"
    ),
    "CISCOFW305011": (
        r"%{CISCO_ACTION:action} %{CISCO_XLATE_TYPE:xlate_type} "
        r"%{WORD:protocol} translation from "
        r"%{DATA:src_interface}:%{IP:src_ip}(/%{INT:src_port})?"
        r"(\(%{DATA:src_fwuser}\))? to "
        r"%{DATA:src_xlated_interface}:%{IP:src_xlated_ip}"
        r"/%{DATA:src_xlated_port}"
    ),
    "CISCOFW313001_313004_313008": (
        r"%{CISCO_ACTION:action} %{WORD:protocol} type=%{INT:icmp_type}, "
        r"code=%{INT:icmp_code} from %{IP:src_ip} on interface "
        r"%{DATA:interface}( to %{IP:dst_ip})?"
    ),
    "CISCOFW419001": (
        r"%{CISCO_ACTION:action} %{WORD:protocol} packet from "
        r"%{DATA:src_interface}:%{IP:src_ip}/%{INT:src_port} to "
        r"%{DATA:dst_interface}:%{IP:dst_ip}/%{INT:dst_port}, "
        r"reason: %{GREEDYDATA:reason}"
    ),
    "CISCOFW500004": (
        r"%{CISCO_REASON:reason} for protocol=%{WORD:protocol}, from "
        r"%{IP:src_ip}/%{INT:src_port} to %{IP:dst_ip}/%{INT:dst_port}"
    ),
    "CISCOFW710001_710002_710003_710005_710006": (
        r"%{WORD:protocol} (?:request|access) %{CISCO_ACTION:action} from "
        r"%{IP:src_ip}/%{INT:src_port} to "
        r"%{DATA:dst_interface}:%{IP:dst_ip}/%{INT:dst_port}"
    ),
    # JunOS RT_FLOW session events
    "RT_FLOW_EVENT": (r"(RT_FLOW_SESSION_CREATE|RT_FLOW_SESSION_CLOSE"
                      r"|RT_FLOW_SESSION_DENY)"),
    "RT_FLOW1": (
        r"%{RT_FLOW_EVENT:event}: %{GREEDYDATA:close-reason}: "
        r"%{IP:src-ip}/%{DATA:src-port}->%{IP:dst-ip}/%{DATA:dst-port} "
        r"%{DATA:service} %{IP:nat-src-ip}/%{DATA:nat-src-port}->"
        r"%{IP:nat-dst-ip}/%{DATA:nat-dst-port} %{DATA:src-nat-rule-name} "
        r"%{DATA:dst-nat-rule-name} %{INT:protocol-id} %{DATA:policy-name} "
        r"%{DATA:from-zone} %{DATA:to-zone} %{INT:session-id} "
        r"\d+\(%{DATA:sent}\) \d+\(%{DATA:received}\) "
        r"%{INT:elapsed-time} .*"
    ),
    "RT_FLOW2": (
        r"%{RT_FLOW_EVENT:event}: session created "
        r"%{IP:src-ip}/%{DATA:src-port}->%{IP:dst-ip}/%{DATA:dst-port} "
        r"%{DATA:service} %{IP:nat-src-ip}/%{DATA:nat-src-port}->"
        r"%{IP:nat-dst-ip}/%{DATA:nat-dst-port} %{DATA:src-nat-rule-name} "
        r"%{DATA:dst-nat-rule-name} %{INT:protocol-id} %{DATA:policy-name} "
        r"%{DATA:from-zone} %{DATA:to-zone} %{INT:session-id} .*"
    ),
    "RT_FLOW3": (
        r"%{RT_FLOW_EVENT:event}: session denied "
        r"%{IP:src-ip}/%{DATA:src-port}->%{IP:dst-ip}/%{DATA:dst-port} "
        r"%{DATA:service} %{INT:protocol-id}\(\d\) %{DATA:policy-name} "
        r"%{DATA:from-zone} %{DATA:to-zone} .*"
    ),
    # MikroTik firewall log
    "MIKROTIKFWALL": (
        r"%{SYSLOGHOST:logsource} %{DATA:action}: in:%{DATA:in} "
        r"out:%{DATA:out}( ,src-mac %{MAC:srcmac})?, "
        r"proto %{GREEDYDATA:tcptype}, %{IP:srcip}(:%{POSINT:srcport})?"
        r"->%{IP:dstip}(:%{POSINT:dstport})?, len %{NUMBER:len}"
    ),
}

# --- nagios log lines (the documented nagios.log record grammar) -------------

NAGIOS_PATTERNS: dict[str, str] = {
    "NAGIOSTIME": r"\[%{NUMBER:nagios_epoch}\]",
    "NAGIOS_TYPE_CURRENT_SERVICE_STATE": r"CURRENT SERVICE STATE",
    "NAGIOS_TYPE_CURRENT_HOST_STATE": r"CURRENT HOST STATE",
    "NAGIOS_TYPE_SERVICE_NOTIFICATION": r"SERVICE NOTIFICATION",
    "NAGIOS_TYPE_HOST_NOTIFICATION": r"HOST NOTIFICATION",
    "NAGIOS_TYPE_SERVICE_ALERT": r"SERVICE ALERT",
    "NAGIOS_TYPE_HOST_ALERT": r"HOST ALERT",
    "NAGIOS_TYPE_SERVICE_FLAPPING_ALERT": r"SERVICE FLAPPING ALERT",
    "NAGIOS_TYPE_HOST_FLAPPING_ALERT": r"HOST FLAPPING ALERT",
    "NAGIOS_TYPE_SERVICE_DOWNTIME_ALERT": r"SERVICE DOWNTIME ALERT",
    "NAGIOS_TYPE_HOST_DOWNTIME_ALERT": r"HOST DOWNTIME ALERT",
    "NAGIOS_TYPE_PASSIVE_SERVICE_CHECK": r"PASSIVE SERVICE CHECK",
    "NAGIOS_TYPE_PASSIVE_HOST_CHECK": r"PASSIVE HOST CHECK",
    "NAGIOS_TYPE_SERVICE_EVENT_HANDLER": r"SERVICE EVENT HANDLER",
    "NAGIOS_TYPE_HOST_EVENT_HANDLER": r"HOST EVENT HANDLER",
    "NAGIOS_TYPE_EXTERNAL_COMMAND": r"EXTERNAL COMMAND",
    "NAGIOS_TYPE_TIMEPERIOD_TRANSITION": r"TIMEPERIOD TRANSITION",
    "NAGIOS_WARNING": r"Warning:%{SPACE}%{GREEDYDATA:nagios_message}",
    "NAGIOS_CURRENT_SERVICE_STATE": (
        r"%{NAGIOS_TYPE_CURRENT_SERVICE_STATE:nagios_type}: "
        r"%{DATA:nagios_hostname};%{DATA:nagios_service};%{DATA:nagios_state}"
        r";%{DATA:nagios_statetype};%{DATA:nagios_statecode}"
        r";%{GREEDYDATA:nagios_message}"
    ),
    "NAGIOS_CURRENT_HOST_STATE": (
        r"%{NAGIOS_TYPE_CURRENT_HOST_STATE:nagios_type}: "
        r"%{DATA:nagios_hostname};%{DATA:nagios_state}"
        r";%{DATA:nagios_statetype};%{DATA:nagios_statecode}"
        r";%{GREEDYDATA:nagios_message}"
    ),
    "NAGIOS_SERVICE_NOTIFICATION": (
        r"%{NAGIOS_TYPE_SERVICE_NOTIFICATION:nagios_type}: "
        r"%{DATA:nagios_notifyname};%{DATA:nagios_hostname}"
        r";%{DATA:nagios_service};%{DATA:nagios_state}"
        r";%{DATA:nagios_contact};%{GREEDYDATA:nagios_message}"
    ),
    "NAGIOS_HOST_NOTIFICATION": (
        r"%{NAGIOS_TYPE_HOST_NOTIFICATION:nagios_type}: "
        r"%{DATA:nagios_notifyname};%{DATA:nagios_hostname}"
        r";%{DATA:nagios_state};%{DATA:nagios_contact}"
        r";%{GREEDYDATA:nagios_message}"
    ),
    "NAGIOS_SERVICE_ALERT": (
        r"%{NAGIOS_TYPE_SERVICE_ALERT:nagios_type}: %{DATA:nagios_hostname}"
        r";%{DATA:nagios_service};%{DATA:nagios_state}"
        r";%{DATA:nagios_statelevel};%{NUMBER:nagios_attempt}"
        r";%{GREEDYDATA:nagios_message}"
    ),
    "NAGIOS_HOST_ALERT": (
        r"%{NAGIOS_TYPE_HOST_ALERT:nagios_type}: %{DATA:nagios_hostname}"
        r";%{DATA:nagios_state};%{DATA:nagios_statelevel}"
        r";%{NUMBER:nagios_attempt};%{GREEDYDATA:nagios_message}"
    ),
    "NAGIOS_SERVICE_FLAPPING_ALERT": (
        r"%{NAGIOS_TYPE_SERVICE_FLAPPING_ALERT:nagios_type}: "
        r"%{DATA:nagios_hostname};%{DATA:nagios_service}"
        r";%{DATA:nagios_state};%{GREEDYDATA:nagios_message}"
    ),
    "NAGIOS_HOST_FLAPPING_ALERT": (
        r"%{NAGIOS_TYPE_HOST_FLAPPING_ALERT:nagios_type}: "
        r"%{DATA:nagios_hostname};%{DATA:nagios_state}"
        r";%{GREEDYDATA:nagios_message}"
    ),
    "NAGIOS_SERVICE_DOWNTIME_ALERT": (
        r"%{NAGIOS_TYPE_SERVICE_DOWNTIME_ALERT:nagios_type}: "
        r"%{DATA:nagios_hostname};%{DATA:nagios_service}"
        r";%{DATA:nagios_state};%{GREEDYDATA:nagios_comment}"
    ),
    "NAGIOS_HOST_DOWNTIME_ALERT": (
        r"%{NAGIOS_TYPE_HOST_DOWNTIME_ALERT:nagios_type}: "
        r"%{DATA:nagios_hostname};%{DATA:nagios_state}"
        r";%{GREEDYDATA:nagios_comment}"
    ),
    "NAGIOS_PASSIVE_SERVICE_CHECK": (
        r"%{NAGIOS_TYPE_PASSIVE_SERVICE_CHECK:nagios_type}: "
        r"%{DATA:nagios_hostname};%{DATA:nagios_service}"
        r";%{DATA:nagios_state};%{GREEDYDATA:nagios_comment}"
    ),
    "NAGIOS_PASSIVE_HOST_CHECK": (
        r"%{NAGIOS_TYPE_PASSIVE_HOST_CHECK:nagios_type}: "
        r"%{DATA:nagios_hostname};%{DATA:nagios_state}"
        r";%{GREEDYDATA:nagios_comment}"
    ),
    "NAGIOS_SERVICE_EVENT_HANDLER": (
        r"%{NAGIOS_TYPE_SERVICE_EVENT_HANDLER:nagios_type}: "
        r"%{DATA:nagios_hostname};%{DATA:nagios_service}"
        r";%{DATA:nagios_state};%{DATA:nagios_statelevel}"
        r";%{DATA:nagios_event_handler_name}"
    ),
    "NAGIOS_HOST_EVENT_HANDLER": (
        r"%{NAGIOS_TYPE_HOST_EVENT_HANDLER:nagios_type}: "
        r"%{DATA:nagios_hostname};%{DATA:nagios_state}"
        r";%{DATA:nagios_statelevel};%{DATA:nagios_event_handler_name}"
    ),
    "NAGIOS_TIMEPERIOD_TRANSITION": (
        r"%{NAGIOS_TYPE_TIMEPERIOD_TRANSITION:nagios_type}: "
        r"%{DATA:nagios_service};%{DATA:nagios_unknown1}"
        r";%{DATA:nagios_unknown2};"
    ),
}

EXTENDED_PATTERNS: dict[str, str] = {
    **HAPROXY_PATTERNS,
    **LINUX_SYSLOG_PATTERNS,
    **JAVA_PATTERNS,
    **APP_PATTERNS,
    **FIREWALL_PATTERNS,
    **NAGIOS_PATTERNS,
}

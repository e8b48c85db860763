"""BEL Commons web-service exchange (reference ``io/web.py:52-121``).

The reference POSTs the node-link JSON payload to ``/api/receive/`` with
basic auth and GETs ``/api/network/<id>/export/nodelink`` back; here the
HTTP transport is INJECTABLE (``transport(method, url, headers, body) ->
bytes``) with a stdlib-urllib default, so the protocol is testable offline
and no third-party HTTP client is required. Graph payloads go through the
same :func:`io_formats.to_nodelink` / :func:`io_formats.from_nodelink`
converters as every other interchange path.
"""
import base64
import json
import os

RECEIVE_ENDPOINT = '/api/receive/'
GET_ENDPOINT = '/api/network/{}/export/nodelink'
HOST_ENV = 'PYBEL_REMOTE_HOST'
USER_ENV = 'PYBEL_REMOTE_USER'
PASSWORD_ENV = 'PYBEL_REMOTE_PASSWORD'


def _default_transport(method, url, headers, body=None):
    import urllib.request

    req = urllib.request.Request(url, data=body, headers=headers,
                                 method=method)
    with urllib.request.urlopen(req) as resp:  # noqa: S310 (caller's URL)
        return resp.read()


def _resolve(value, env):
    if value is not None:
        return value
    value = os.environ.get(env)
    if value is None:
        raise ValueError('no {} configured (pass it or set ${})'.format(
            env.rsplit('_', 1)[-1].lower(), env))
    return value


def to_web(nodes, edges, metadata=None, host=None, user=None, password=None,
           public=False, transport=None):
    """Send a graph to a BEL-Commons-style receiver service
    (reference io/web.py:52-102). Returns the decoded JSON response."""
    from .io_formats import to_nodelink

    host = _resolve(host, HOST_ENV)
    user = _resolve(user, USER_ENV)
    password = _resolve(password, PASSWORD_ENV)
    url = host.rstrip('/') + RECEIVE_ENDPOINT
    auth = base64.b64encode(
        '{}:{}'.format(user, password).encode()).decode()
    body = json.dumps(to_nodelink(nodes, edges, metadata)).encode('utf8')
    headers = {
        'content-type': 'application/json',
        'bel-commons-public': 'true' if public else 'false',
        'authorization': 'Basic ' + auth,
    }
    raw = (transport or _default_transport)('POST', url, headers, body)
    return json.loads(raw) if raw else {}


def from_web(spark, network_id, host=None, transport=None):
    """Retrieve a network by id from a BEL-Commons-style service and decode
    it through from_nodelink (reference io/web.py:105-121).
    Returns (nodes, edges) DataFrames."""
    from .io_formats import from_nodelink

    host = _resolve(host, HOST_ENV)
    url = host.rstrip('/') + GET_ENDPOINT.format(network_id)
    raw = (transport or _default_transport)('GET', url, {})
    return from_nodelink(spark, json.loads(raw))

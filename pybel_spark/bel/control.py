"""SET/UNSET control-line state machine.

Replicates the reference control-record semantics (reference:
src/pybel/parser/parse_control.py:46-379): citation arity/type validation,
citation clearing, annotation definition/value validation, UNSET handling.
State is strictly per-document, so this folds row-locally inside a UDF batch.
"""
from .constants import (
    BEL_KEYWORD_ALL, BEL_KEYWORD_CITATION, BEL_KEYWORD_EVIDENCE,
    BEL_KEYWORD_STATEMENT_GROUP, BEL_KEYWORD_SUPPORT, CITATION_TYPES,
    CITATION_TYPE_PUBMED,
)
from .exc import (
    CitationTooLongException, CitationTooShortException,
    IllegalAnnotationValueWarning, InvalidCitationType,
    InvalidPubMedIdentifierWarning, MissingAnnotationKeyWarning,
    MissingAnnotationRegexWarning, MissingCitationException,
    UndefinedAnnotationWarning,
)
from .grammar import Scanner, _IDENT_CHARS


def _is_int(s):
    try:
        int(s)
        return True
    except ValueError:
        return False


class ControlState:
    """Per-document control state (citation / evidence / annotations)."""

    def __init__(
        self,
        annotation_to_term=None,
        annotation_to_pattern=None,
        annotation_to_local=None,
        citation_clearing=True,
        required_annotations=None,
    ):
        self.annotation_to_term = annotation_to_term or {}
        self.annotation_to_pattern = annotation_to_pattern or {}
        self.annotation_to_local = annotation_to_local or {}
        self.citation_clearing = citation_clearing
        self.required_annotations = required_annotations or []

        self.statement_group = None
        self.citation_db = None
        self.citation_db_id = None
        self.evidence = None
        self.annotations = {}

    # -- queries ---------------------------------------------------------

    @property
    def citation_is_set(self):
        return self.citation_db is not None and self.citation_db_id is not None

    @property
    def _in_debug_mode(self):
        return not self.annotation_to_term and not self.annotation_to_pattern

    def has_annotation(self, key):
        return (
            key in self.annotation_to_term
            or key in self.annotation_to_pattern
            or key in self.annotation_to_local
        )

    def get_missing_required_annotations(self):
        return [a for a in self.required_annotations if a not in self.annotations]

    def prepared_annotations(self):
        """Edge-ready annotations: {key: sorted list of values}
        (parse_bel.py:797-810 builds {key: {value: True}})."""
        out = {}
        for key, entry in self.annotations.items():
            if isinstance(entry, set):
                out[key] = sorted(entry)
            else:
                out[key] = [entry]
        return out

    # -- mutations --------------------------------------------------------

    def clear_citation(self):
        self.citation_db = None
        self.citation_db_id = None
        if self.citation_clearing:
            self.evidence = None
            self.annotations.clear()

    def clear(self):
        self.statement_group = None
        self.citation_db = None
        self.citation_db_id = None
        self.evidence = None
        self.annotations.clear()

    # -- line handling -----------------------------------------------------

    def handle_set(self, s: Scanner, line, line_number):
        """Handle the remainder of a ``SET ...`` line."""
        position = s.pos
        key = s.read_word(_IDENT_CHARS)

        if key == BEL_KEYWORD_STATEMENT_GROUP:
            s.expect('=')
            self.statement_group = s.read_word_or_quoted()
            return

        if key == BEL_KEYWORD_CITATION:
            s.expect('=')
            values = self._read_quoted_list(s)
            self._handle_citation(values, line, line_number, position)
            return

        if key in (BEL_KEYWORD_EVIDENCE, BEL_KEYWORD_SUPPORT):
            s.expect('=')
            self.evidence = s.read_quoted()
            return

        # plain annotation key — validated before use (parse_control.py:200-208)
        if self.citation_clearing and not self.citation_is_set:
            raise MissingCitationException(line_number, line, position)
        if not self._in_debug_mode and not self.has_annotation(key):
            raise UndefinedAnnotationWarning(line_number, line, position, key)

        s.expect('=')
        if s.peek() == '{':
            values = self._read_quoted_list(s)
            for value in values:
                self._validate_annotation_value(line, line_number, position, key, value)
            self.annotations[key] = set(values)
        else:
            value = s.read_word_or_quoted()
            self._validate_annotation_value(line, line_number, position, key, value)
            self.annotations[key] = value

    def handle_unset(self, s: Scanner, line, line_number):
        """Handle the remainder of an ``UNSET ...`` line."""
        position = s.pos

        if s.peek() == '{':
            values = self._read_ident_list(s)
            for key in values:
                if key in (BEL_KEYWORD_EVIDENCE, BEL_KEYWORD_SUPPORT):
                    self.evidence = None
                else:
                    if key not in self.annotations:
                        raise MissingAnnotationKeyWarning(line_number, line, position, key)
                    del self.annotations[key]
            return

        key = s.read_word(_IDENT_CHARS)

        if key == BEL_KEYWORD_ALL:
            self.clear()
            return
        if key == BEL_KEYWORD_CITATION:
            if not self.citation_is_set:
                raise MissingAnnotationKeyWarning(line_number, line, position, key)
            self.clear_citation()
            return
        if key in (BEL_KEYWORD_EVIDENCE, BEL_KEYWORD_SUPPORT):
            if self.evidence is None:
                raise MissingAnnotationKeyWarning(line_number, line, position, key)
            self.evidence = None
            return
        if key == BEL_KEYWORD_STATEMENT_GROUP:
            if self.statement_group is None:
                raise MissingAnnotationKeyWarning(line_number, line, position, key)
            self.statement_group = None
            return

        # single annotation key: validated like SET (parse_control.py:97-98,312-320)
        if self.citation_clearing and not self.citation_is_set:
            raise MissingCitationException(line_number, line, position)
        if not self._in_debug_mode and not self.has_annotation(key):
            raise UndefinedAnnotationWarning(line_number, line, position, key)
        if key not in self.annotations:
            raise MissingAnnotationKeyWarning(line_number, line, position, key)
        del self.annotations[key]

    # -- helpers -----------------------------------------------------------

    def _handle_citation(self, values, line, line_number, position):
        """SET Citation = {...} (parse_control.py:215-248)."""
        self.clear_citation()
        if len(values) < 2:
            raise CitationTooShortException(line_number, line, position)
        citation_db = values[0]
        if citation_db not in CITATION_TYPES:
            raise InvalidCitationType(line_number, line, position, citation_db)
        if len(values) == 2:
            citation_db_id = values[1]
        elif len(values) > 6:
            raise CitationTooLongException(line_number, line, position)
        else:
            citation_db_id = values[2]  # position 1 is the discarded journal name
        if citation_db == CITATION_TYPE_PUBMED and not _is_int(citation_db_id):
            raise InvalidPubMedIdentifierWarning(
                line_number, line, position, citation_db_id)
        self.citation_db = citation_db
        self.citation_db_id = citation_db_id

    def _validate_annotation_value(self, line, line_number, position, key, value):
        if self._in_debug_mode:
            return
        if key in self.annotation_to_term and value not in self.annotation_to_term[key]:
            raise IllegalAnnotationValueWarning(line_number, line, position, key, value)
        if key in self.annotation_to_pattern \
                and not self.annotation_to_pattern[key].match(value):
            raise MissingAnnotationRegexWarning(line_number, line, position, key, value)
        if key in self.annotation_to_local and value not in self.annotation_to_local[key]:
            raise IllegalAnnotationValueWarning(line_number, line, position, key, value)

    @staticmethod
    def _read_quoted_list(s: Scanner):
        s.expect('{')
        values = [s.read_quoted()]
        while s.try_char(','):
            values.append(s.read_quoted())
        s.expect('}')
        return values

    @staticmethod
    def _read_ident_list(s: Scanner):
        s.expect('{')
        values = [s.read_word(_IDENT_CHARS)]
        while s.try_char(','):
            values.append(s.read_word(_IDENT_CHARS))
        s.expect('}')
        return values


def is_control_line(line):
    """Is this line a SET/UNSET control record?"""
    return line.startswith('SET ') or line.startswith('UNSET ') \
        or line.startswith('UNSET_ALL') or line == 'UNSET'

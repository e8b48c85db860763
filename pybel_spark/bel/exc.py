"""Typed parser warnings.

Class names match the reference compiler's warning taxonomy
(reference: src/pybel/parser/exc.py) so the warnings table is comparable;
the hierarchy/implementation is new and minimal.
"""


class BELParserWarning(Exception):
    """Base class for all BEL parsing warnings."""

    def __init__(self, line_number, line, position, *args):
        super().__init__(line_number, line, position, *args)
        self.line_number = line_number
        self.line = line
        self.position = position
        #: class-specific payload (namespace/name/key/value...), in the same
        #: positional order the reference passes to its warning constructors
        self.extras = args


class BELSyntaxError(BELParserWarning):
    def __str__(self):
        return 'General parser failure at position {}: {}'.format(self.position, self.line)


class NakedNameWarning(BELParserWarning):
    pass


class MissingDefaultNameWarning(BELParserWarning):
    pass


class UndefinedNamespaceWarning(BELParserWarning):
    pass


class MissingNamespaceNameWarning(BELParserWarning):
    pass


class MissingNamespaceRegexWarning(BELParserWarning):
    pass


class UndefinedAnnotationWarning(BELParserWarning):
    pass


class MissingAnnotationKeyWarning(BELParserWarning):
    pass


class IllegalAnnotationValueWarning(BELParserWarning):
    pass


class MissingAnnotationRegexWarning(BELParserWarning):
    pass


class VersionFormatWarning(BELParserWarning):
    pass


class MalformedMetadataException(BELParserWarning):
    pass


class InvalidMetadataException(BELParserWarning):
    pass


class MissingMetadataException(BELParserWarning):
    pass


class RedefinedNamespaceError(BELParserWarning):
    pass


class RedefinedAnnotationError(BELParserWarning):
    pass


class CitationTooShortException(BELParserWarning):
    pass


class CitationTooLongException(BELParserWarning):
    pass


class MissingCitationException(BELParserWarning):
    pass


class MissingSupportWarning(BELParserWarning):
    pass


class MissingAnnotationWarning(BELParserWarning):
    pass


class InvalidCitationType(BELParserWarning):
    pass


class InvalidPubMedIdentifierWarning(BELParserWarning):
    pass


class MalformedTranslocationWarning(BELParserWarning):
    pass


class PlaceholderAminoAcidWarning(BELParserWarning):
    pass


class NestedRelationWarning(BELParserWarning):
    pass


class InvalidEntity(BELParserWarning):
    pass


class InvalidFunctionSemantic(BELParserWarning):
    pass

"""Reference exception taxonomy.

The reference exposes a flat family of typed exceptions at package level
(`python/deeplake/__init__.pyi:3792-3990`) — user code catches
`deeplake.ColumnDoesNotExistError`, `deeplake.BranchNotFoundError`, etc.
Here every dataset-facing error subclasses :class:`DatasetError` (our
historical base, kept as the catch-all), so both styles work:

    except deeplake_spark.DatasetError:            # engine catch-all
    except deeplake_spark.BranchNotFoundError:     # reference-style

A few classes dual-inherit a stdlib type (``ValueError`` /
``NotImplementedError``) because those are the types this engine raised
before the taxonomy existed and callers may already pin them.

Hosted-service errors (AgreementError, AuthenticationError, HTTP*,
Storage*) exist for catch-clause compatibility — user code written
against the reference catches them by name — but only the storage
facade's local backends raise the Storage* ones; there is no hosted
control plane in this engine (see storage.py), so the agreement/auth/
HTTP family is never raised by us.
"""

from __future__ import annotations


class DatasetError(RuntimeError):
    """Base for all dataset-facing errors (catch-all)."""


class MergeConflictError(DatasetError):
    """A shared row (or column type) was modified on both branches since
    the merge base; pass resolve='ours'/'theirs' to pick a side."""


# ------------------------------------------------------------ columns

class ColumnAlreadyExistsError(DatasetError):
    """add_column with a name already in the schema (__init__.pyi:3804)."""


class ColumnDoesNotExistError(DatasetError, KeyError):
    """Column name not in the schema (__init__.pyi:3807)."""


class EmptyColumnNameError(DatasetError, ValueError):
    """'' is not a column name (__init__.pyi:3831)."""


class InvalidColumnValueError(DatasetError, ValueError):
    """Value incompatible with the column type (__init__.pyi:3810)."""


class ColumnMissingAppendValueError(DatasetError):
    """append() row lacks a value for a schema column (__init__.pyi:3801)."""


class UnevenColumnsError(DatasetError):
    """append() columns have differing lengths (__init__.pyi:3795)."""


class UnevenUpdateError(DatasetError):
    """Batch update spans differing row counts (__init__.pyi:3798)."""


# ------------------------------------------------------ branches / tags

class BranchExistsError(DatasetError):
    """branch() name already taken (__init__.pyi:3882)."""


class BranchNotFoundError(DatasetError):
    """No such branch (__init__.pyi:3885)."""


class CannotDeleteMainBranchError(DatasetError):
    """main (or the current branch) refuses deletion (__init__.pyi)."""


class CannotRenameMainBranchError(DatasetError):
    """main refuses renaming (__init__.pyi)."""


class TagExistsError(DatasetError):
    """tag() name already taken (__init__.pyi:3891)."""


class TagNotFoundError(DatasetError):
    """No such tag (__init__.pyi:3888)."""


class VersionNotFoundError(DatasetError):
    """checkout/open of an unknown version id (__init__.pyi)."""


# ------------------------------------------------------------- indexes

class IndexAlreadyExistsError(DatasetError):
    """create_index on an already-indexed column (__init__.pyi:3825)."""


class InvalidIndexCreationError(DatasetError, ValueError):
    """Unsupported index kind / missing required options
    (__init__.pyi:3819)."""


# ------------------------------------------------------------ open/write

class ReadOnlyDatasetModificationError(DatasetError):
    """Write API called on a read-only handle (__init__.pyi:3870)."""


class NotFoundError(DatasetError):
    """No dataset at the given path (__init__.pyi:3921)."""


class DatasetUnavailableError(NotFoundError):
    """Dataset cannot be reached (__init__.pyi:3873); for this engine a
    subclass of NotFoundError — there is no network control plane whose
    transient failures would distinguish the two."""


class DatasetExistsError(DatasetError):
    """create() over an existing dataset (reference raises a runtime
    error with the same message shape; named here for symmetry)."""


class WriteFailedError(DatasetError):
    """A data/metadata write did not land (__init__.pyi)."""


class PushError(DatasetError):
    """push/pull replication failure (__init__.pyi:3897)."""


class LogExistsError(DatasetError):
    """Operation log already enabled (__init__.pyi:3903)."""


class LogNotexistsError(DatasetError):
    """replay_log/operation_log with no log present (__init__.pyi:3906).
    (Name kept verbatim from the reference, typo included.)"""


class IncorrectDeeplakePathError(DatasetError, ValueError):
    """Malformed dataset path/URI (__init__.pyi:3909)."""


class InvalidURIError(DatasetError, ValueError):
    """URI scheme not resolvable to a storage backend (__init__.pyi)."""


class StorageProviderMissingError(DatasetError):
    """No registered store for the path's scheme (__init__.pyi)."""


class StorageKeyNotFound(DatasetError, KeyError):
    """Metadata-store read of a missing key (__init__.pyi)."""


class StorageKeyAlreadyExists(DatasetError):
    """Metadata-store create over an existing key (__init__.pyi)."""


# --------------------------------------------------------------- types

class UnknownType(DatasetError, ValueError):
    """Unrecognized dtype/htype name (__init__.pyi:3957)."""


class InvalidType(DatasetError, ValueError):
    """Type invalid in this position (__init__.pyi:3900)."""


class UnknownStringType(DatasetError, ValueError):
    """Unparseable type string (__init__.pyi:3942)."""


class UnspecifiedDtype(DatasetError, ValueError):
    """Type requires an explicit dtype (__init__.pyi)."""


class InvalidTypeDimensions(DatasetError, ValueError):
    """Dimension spec incompatible with the type (__init__.pyi)."""


class InvalidTypeAndFormatPair(DatasetError, ValueError):
    """Type/format combination not allowed (__init__.pyi:3951)."""


# ---------------------------------------------------- formats / codecs

class FormatNotSupportedError(DatasetError, NotImplementedError):
    """Codec/format has no decoder in this environment
    (__init__.pyi:3792). Subclasses NotImplementedError because strict-
    mode decode raised that before the taxonomy existed."""


class UnknownFormat(DatasetError, ValueError):
    """Unrecognized datafile format object (__init__.pyi:3939)."""


class UnsupportedSampleCompression(DatasetError, ValueError):
    """sample_compression codec not supported (__init__.pyi)."""


class UnsupportedChunkCompression(DatasetError, ValueError):
    """chunk_compression codec not supported (__init__.pyi)."""


class InvalidChunkStrategyType(DatasetError, ValueError):
    """Bad chunk strategy object (__init__.pyi:3945)."""


# --------------------------------------------- service / control plane
# (catch-clause compatibility: reference names __init__.pyi:3792-3990;
# this engine has no hosted control plane, so most are never raised
# here — Storage* are raised by the storage facade's backends)

class ServiceError(DatasetError):
    """Base for control-plane/service errors (agreement/auth/HTTP)."""


class AgreementError(ServiceError):
    """Dataset agreement problem (__init__.pyi)."""


class AgreementNotAcceptedError(AgreementError):
    """Dataset agreement was not accepted."""


class NotLoggedInAgreementError(AgreementError):
    """Agreement flow requires a logged-in user."""


class AuthenticationError(ServiceError):
    """Invalid or missing credentials."""


class AuthorizationError(ServiceError):
    """Authenticated but not permitted."""


class PermissionDeniedError(AuthorizationError):
    """Operation denied for this principal."""


class ExpiredTokenError(AuthenticationError):
    """Auth token expired."""


class BadRequestError(ServiceError):
    """Malformed control-plane request."""


class HTTPRequestFailedError(ServiceError):
    """Control-plane HTTP call failed."""


class HTTPBodyIsMissingError(HTTPRequestFailedError):
    """HTTP response had no body."""


class HTTPBodyIsNotJSONError(HTTPRequestFailedError):
    """HTTP response body was not JSON."""


class CredsKeyAlreadyAssignedError(ServiceError):
    """set_creds_key on a dataset that already has one."""


class InvalidCredsKeyAssignmentError(ServiceError):
    """creds key cannot be assigned to this dataset."""


# ----------------------------------------------------------- storage

class StorageAccessDenied(DatasetError):
    """Storage backend denied access (__init__.pyi)."""


class StorageInternalError(DatasetError):
    """Storage backend internal failure."""


class StorageNetworkConnectionError(DatasetError):
    """Storage backend unreachable."""


class GcsStorageProviderFailed(StorageInternalError):
    """GCS-specific storage failure."""


# ----------------------------------------------- data / codec / shape

class ReadOnlyDataset(DatasetError):
    """Write attempted on a read-only dataset handle (__init__.pyi).
    (Our write guard historically raised ReadOnlyDatasetError; both
    names resolve to typed DatasetError subclasses.)"""


class TensorAlreadyExists(DatasetError):
    """Tensor/column already exists (v3 vocabulary)."""


class DimensionsMismatch(DatasetError, ValueError):
    """nd value has the wrong number of dimensions."""


class DimensionsMismatchError(DimensionsMismatch):
    """Alias family member kept distinct in the reference."""


class DtypeMismatch(DatasetError, ValueError):
    """Value dtype does not match the column dtype."""


class EmbeddingSizeMismatch(DatasetError, ValueError):
    """Embedding length differs from the declared size."""


class InvalidSequenceOfSequence(DatasetError, ValueError):
    """Nested sequence value has inconsistent shape."""


class UnsupportedPythonType(DatasetError, TypeError):
    """Python value type not storable."""


class InvalidTextType(DatasetError, ValueError):
    """Text column value is not a string."""


class UnexpectedMedicalTypeInputData(DatasetError, ValueError):
    """Medical column fed non-medical payload."""


class UnexpectedInputDataForDicomColumn(UnexpectedMedicalTypeInputData):
    """Dicom column fed non-dicom payload."""


class InvalidPolygonShapeError(DatasetError, ValueError):
    """Polygon column value has a bad shape."""


class UnknownBoundingBoxCoordinateFormat(DatasetError, ValueError):
    """BoundingBox coordinate format string unknown."""


class UnknownBoundingBoxPixelFormat(DatasetError, ValueError):
    """BoundingBox pixel format string unknown."""


class InvalidImageCompression(DatasetError, ValueError):
    """Image codec not valid for this column."""


class InvalidTextCompression(DatasetError, ValueError):
    """Text compression codec not valid."""


class InvalidMedicalCompression(DatasetError, ValueError):
    """Medical codec not valid for this column."""


class InvalidBinaryMaskCompression(DatasetError, ValueError):
    """BinaryMask codec not valid for this column."""


class InvalidSegmentMaskCompression(DatasetError, ValueError):
    """SegmentMask codec not valid for this column."""


class WrongSampleCompression(DatasetError, ValueError):
    """Sample codec mismatch at write time."""


class WrongChunkCompression(DatasetError, ValueError):
    """Chunk codec mismatch at write time."""


class CanNotCreateTensorWithProvidedCompressions(DatasetError, ValueError):
    """sample/chunk compression pair is not constructible."""


class InvalidLinkDataError(DatasetError, ValueError):
    """Link column value is not a valid link."""


class InvalidLinkType(DatasetError, TypeError):
    """Link column type misuse."""


# ------------------------------------------------------ index / chunk

class JSONKeyNotFound(DatasetError, KeyError):
    """JSON path key absent (__init__.pyi)."""


class JSONIndexNotFound(DatasetError, KeyError):
    """JSON array index absent."""


class BytePositionIndexOutOfChunk(DatasetError, IndexError):
    """Chunk-internal byte index out of range (v3 vocabulary)."""


class ShapeIndexOutOfChunk(DatasetError, IndexError):
    """Chunk-internal shape index out of range (v3 vocabulary)."""


__all__ = [
    n for n, v in list(globals().items())
    if isinstance(v, type) and issubclass(v, DatasetError)
]

package graft.functions;

import org.apache.spark.sql.catalyst.InternalRow;
import org.apache.spark.sql.connector.catalog.functions.ScalarFunction;
import org.apache.spark.sql.types.DataType;
import org.apache.spark.sql.types.DataTypes;

/**
 * Bound {@code hamming64} (resolved by {@code GraftFunctionCatalog}) —
 * implemented in JAVA so the magic method is a TRUE JVM STATIC.
 *
 * The former Scala {@code object Bound} compiled {@code invoke} to an
 * INSTANCE method of the singleton class; Catalyst's magic-method
 * binding emitted a static-style call against that class and Janino
 * rejected it ("No applicable constructor/method found for actual
 * parameters long, long") — the whole stage then silently fell back to
 * interpreted execution with boxed {@code produceResult} rows. That
 * compile-error stack was the "anonymous task stack trace" in the
 * r06/r07 bench tails. A Java static is what the ScalarFunction
 * contract documents for codegen; with it the stage compiles and the
 * call costs what a built-in costs.
 */
public final class HammingBound implements ScalarFunction<Long> {

  public static final HammingBound INSTANCE = new HammingBound();

  private HammingBound() {}

  /** Magic method (exact primitive signature, static). */
  public static long invoke(long a, long b) {
    return Long.bitCount(a ^ b);
  }

  @Override
  public DataType[] inputTypes() {
    return new DataType[] {DataTypes.LongType, DataTypes.LongType};
  }

  @Override
  public DataType resultType() {
    return DataTypes.LongType;
  }

  @Override
  public String name() {
    return "hamming64";
  }

  @Override
  public String canonicalName() {
    return "graft_fns.default.hamming64";
  }

  @Override
  public boolean isDeterministic() {
    return true;
  }

  /** Interpreted fallback (also documents the semantics). */
  @Override
  public Long produceResult(InternalRow input) {
    return (long) Long.bitCount(input.getLong(0) ^ input.getLong(1));
  }
}

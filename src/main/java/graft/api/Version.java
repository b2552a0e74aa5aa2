package graft.api;

import java.lang.annotation.ElementType;
import java.lang.annotation.Retention;
import java.lang.annotation.RetentionPolicy;
import java.lang.annotation.Target;

/**
 * Marks the optimistic-lock version field of a mapped entity (JPA-lite
 * {@code @Version}: the reference's object layer carries the record
 * version through OObjectSerializerHelper and fails a save when the
 * stored version moved). Maintained by {@link ObjectMapper}: 0 on
 * insert, +1 per successful save; a stale in-memory version makes
 * save throw instead of overwriting. Scala case classes annotate as
 * {@code @(Version @field)}; a field named {@code version} is
 * recognized without any annotation.
 */
@Retention(RetentionPolicy.RUNTIME)
@Target({ElementType.FIELD})
public @interface Version {}
